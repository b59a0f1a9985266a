"""Reconstruction of ppuda.deepnets1m.loader surface (enough to import the reference)."""
import torch.utils.data

MAX_NODES_BATCH = 2200


class DeepNets1M(torch.utils.data.Dataset):
    def __init__(self, split='train', nets_dir='./data', virtual_edges=50, num_nets=None,
                 large_images=False, **kwargs):
        super().__init__()
        self.split = split
        self.is_train = split in ('train', 'search')
        self.virtual_edges = virtual_edges
        self.large_images = large_images
        self.nets_dir = nets_dir
        self.h5_data = None
        self.h5_idx = None
        self.nets = []
        self.h5_file = None

    def __len__(self):
        return len(self.nets)


class NetBatchSampler(torch.utils.data.sampler.BatchSampler):
    pass
