from .assembly import tile_params, normalize_params, decode_key, min_decode_size

__all__ = ['tile_params', 'normalize_params', 'decode_key', 'min_decode_size']
