from .tao import Tao
