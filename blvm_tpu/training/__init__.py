from blvm_tpu.training.annealers import Annealer, CosineAnnealer
from blvm_tpu.training.optim import get_optimizer, get_lr_schedule
from blvm_tpu.training.restore import save_run, load_run
from blvm_tpu.training.train_state import TrainState
