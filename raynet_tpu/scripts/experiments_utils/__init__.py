from .experiments_manager import (
    experiment_tag,
    set_output_directory,
    save_experiment_locally,
    register_experiment,
    Metrics,
)
