"""Minimal torchvision stand-in for the reference's two op dependencies
(torchvision is not installed in this image).  Pure-torch implementations
written from the documented operator semantics."""
from . import ops  # noqa: F401
