def _cfg(url='', **kwargs):
    return {'url': url, **kwargs}
from .layers_mod import trunc_normal_
