from .datasets import Omni3D, load_omni3d_json, simple_register, DATASET_CATALOG  # noqa: F401
from .build import build_train_batches, build_test_batches, pad_batch  # noqa: F401
