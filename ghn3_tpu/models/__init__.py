from .ghn_core import init_ghn_params, ghn_forward, decode_conv, decode_1d, decode_bias_class
from .shape_encoder import ShapeTables, tables_for

__all__ = ['init_ghn_params', 'ghn_forward', 'decode_conv', 'decode_1d',
           'decode_bias_class', 'ShapeTables', 'tables_for']
