"""Training: optimizers, train steps, loops, checkpointing, conversion."""

from .optim import make_optimizer, make_lr_schedule  # noqa: F401
from .train_geo import (  # noqa: F401
    GeoTrainState, create_geo_state, make_geo_train_step, make_geo_eval_step,
    make_geo_multi_step, wrap_oracle_overlap,
)
from .train_agent import (  # noqa: F401
    AgentTrainState, create_agent_state, make_rollout_fn, make_ppo_update_step,
    make_val_episode_fn,
)
from .metrics import registration_metrics, MetricLogger  # noqa: F401
from .checkpoint import (  # noqa: F401
    save_checkpoint, restore_checkpoint, save_train_checkpoint,
    restore_train_checkpoint, model_tree_path, restore_model_variables,
    saved_tree_keys,
)
from .convert import convert_torch_multihead, convert_torch_agent  # noqa: F401
from .export import (  # noqa: F401
    export_geo_forward, export_episode, export_composed_pipeline,
    load_exported,
)
