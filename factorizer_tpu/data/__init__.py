from .nifti import NiftiImage, load_nifti, save_nifti
from .dataset import (
    Dataset,
    CacheDataset,
    PersistentDataset,
    DataLoader,
    load_decathlon_datalist,
    partition_datalist,
    stratified_kfold,
)
from . import transforms
