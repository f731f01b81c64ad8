from .logger import Experiment, JsonlLogger, NullLogger
from .profile import profile_trace, StepTimer
from .dashboard import TrainingDashboard, FaderDashboard, moving_average

__all__ = ["Experiment", "JsonlLogger", "NullLogger", "profile_trace",
           "StepTimer", "TrainingDashboard", "FaderDashboard",
           "moving_average"]
