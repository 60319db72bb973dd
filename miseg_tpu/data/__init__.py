from .nifti import load_nifti, save_nifti, NiftiImage  # noqa: F401
from .datalist import load_decathlon_datalist_with_modality  # noqa: F401
from .dataset import Dataset, CacheDataset, ConcatDataset, DataLoader  # noqa: F401
from .multi_modal import MultiModalData, get_loaders  # noqa: F401
