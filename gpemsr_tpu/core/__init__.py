from gpemsr_tpu.core.config import ExperimentConfig, SegConfig, load_yaml
