from .ts import TS, TSAdapt
