from .config import (
    apply_dotted_overrides,
    dump_expconfig,
    load_config,
    model_args_from_config,
    optimizer_args_from_config,
    training_loop_args_from_config,
    data_source_args_from_config,
)
