from .vedai import VedaiDataset, derive_label_path, derive_ir_path
from .synthetic import SyntheticVedai
from .loader import make_train_batches, make_eval_batches, pad_labels
