from ..layers_mod import to_2tuple
