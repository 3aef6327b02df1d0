"""Dataset helpers for this bundle (reference: model_zoo/*/scripts/data.py).

The heavy lifting lives in the framework; this module re-exports the pieces
the configs reference and the label encoding used by this dataset.
"""

from factorizer_tpu.data import load_decathlon_datalist, partition_datalist  # noqa: F401
from factorizer_tpu.data.transforms import (  # noqa: F401
    BraTSOneHotEncoderd,
    Compose,
    LoadImaged,
)
