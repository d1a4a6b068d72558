from ..layers_mod import DropPath, trunc_normal_, to_2tuple, SqueezeExcite
