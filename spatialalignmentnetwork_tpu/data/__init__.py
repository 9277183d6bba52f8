from .paired_dataset import (
    VolumeDataset,
    DummyVolumeDataset,
    AlignedVolumesDataset,
    get_paired_volume_datasets,
    ConcatDataset,
)
from .loader import Loader, Prefetch
