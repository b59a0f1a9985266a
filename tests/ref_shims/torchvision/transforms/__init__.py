class _Unavailable:
    def __init__(self, *a, **k):
        raise NotImplementedError('torchvision stub: transforms unavailable')


Normalize = RandomResizedCrop = RandomHorizontalFlip = ToTensor = Compose = Resize = CenterCrop = _Unavailable
