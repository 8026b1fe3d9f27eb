from .logger import get_logger
from .seed import set_seed
from .meters import AverageMeter, AccMeter
from .schedules import build_schedule
from .optimizers import build_optimizer
from .ema import ema_init, ema_update
from .config_loader import load_config_from_work_dir
