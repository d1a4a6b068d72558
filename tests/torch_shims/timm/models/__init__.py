from . import registry
from .registry import register_model
