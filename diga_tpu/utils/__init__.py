from .checkpoint import (
    export_role_keyed,
    load_role_keyed,
    restore_train_state,
    save_train_state,
)
from .logging import MetricLogger
