from cleantransformer_tpu.trainer.data import (  # noqa: F401
    BelleDataset, DataLoader, belle_collate, packed_collate,
)
from cleantransformer_tpu.trainer.schedules import get_scheduler  # noqa: F401
from cleantransformer_tpu.trainer.trainer import Trainer, TrainingArguments  # noqa: F401
