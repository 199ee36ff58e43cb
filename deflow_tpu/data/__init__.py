from .h5dataset import HDF5Dataset, DataLoader, build_index, collate, pad_points
from .synthetic import make_scene, make_split
