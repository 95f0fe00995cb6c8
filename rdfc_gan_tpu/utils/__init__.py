from .seed import set_random_seed
from .timer import Timer
from .logger import Logger, MovingAverage

__all__ = ["set_random_seed", "Timer", "Logger", "MovingAverage"]
