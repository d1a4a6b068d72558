import torch
import torch.nn as nn

class DropPath(nn.Module):
    def __init__(self, drop_prob=0.0):
        super().__init__()
        self.drop_prob = drop_prob
    def forward(self, x):
        return x

def trunc_normal_(tensor, mean=0., std=1., a=-2., b=2.):
    with torch.no_grad():
        tensor.normal_(mean, std).clamp_(a, b)
    return tensor

def to_2tuple(x):
    return tuple(x) if isinstance(x, (tuple, list)) else (x, x)

class SqueezeExcite(nn.Module):
    """timm 0.6.7 efficientnet-style SE: rd = round(in_chs * rd_ratio)."""
    def __init__(self, in_chs, rd_ratio=0.25, rd_channels=None,
                 act_layer=nn.ReLU, gate_layer=nn.Sigmoid, force_act_layer=None,
                 rd_round_fn=None):
        super().__init__()
        rd_round_fn = rd_round_fn or round
        if not rd_channels:
            rd_channels = rd_round_fn(in_chs * rd_ratio)
        self.conv_reduce = nn.Conv2d(in_chs, rd_channels, 1, bias=True)
        self.act1 = act_layer(inplace=True)
        self.conv_expand = nn.Conv2d(rd_channels, in_chs, 1, bias=True)
        self.gate = gate_layer()
    def forward(self, x):
        x_se = x.mean((2, 3), keepdim=True)
        x_se = self.conv_reduce(x_se)
        x_se = self.act1(x_se)
        x_se = self.conv_expand(x_se)
        return x * self.gate(x_se)
