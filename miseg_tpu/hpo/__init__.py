from .study import Study, Trial, TrialPruned, create_study  # noqa: F401
from .samplers import TPESampler, RandomSampler  # noqa: F401
from .pruners import SuccessiveHalvingPruner, NopPruner  # noqa: F401
