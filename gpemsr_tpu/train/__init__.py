from gpemsr_tpu.train.common import TrainState, make_optimizer
from gpemsr_tpu.train.schedules import cosine_annealing_restart, multistep_restart
