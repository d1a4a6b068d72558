def summary(*a, **kw):
    raise NotImplementedError
