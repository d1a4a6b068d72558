"""Minimal thop stand-in (only imported, never executed in parity tests)."""
def profile(model, inputs=None, **kw):
    raise NotImplementedError
def clever_format(values, fmt="%.3f"):
    raise NotImplementedError
