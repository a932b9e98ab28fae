from .kmeans import make_blind_estimator  # noqa: F401
from .metric import make_ambiguity_selector  # noqa: F401
