from .logger import Experiment, JsonlLogger, NullLogger
from .profile import profile_trace, StepTimer

__all__ = ["Experiment", "JsonlLogger", "NullLogger", "profile_trace",
           "StepTimer"]
