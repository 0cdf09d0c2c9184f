from torchmdnet_tpu.data.collate import PaddedLoader, pad_samples  # noqa: F401
from torchmdnet_tpu.data.datamodule import DataModule  # noqa: F401
from torchmdnet_tpu.data.splits import make_splits, train_val_test_split  # noqa: F401
