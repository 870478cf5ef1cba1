from .property import test_property
from .random_gen import Random
from .equivalent import equivalent, Spec

__all__ = ["test_property", "Random", "equivalent", "Spec"]
