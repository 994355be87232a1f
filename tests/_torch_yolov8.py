"""Independent torch implementation of the YOLOv8-face architecture.

Test oracle for calipsync_tpu/nn/yolo.py: a second, from-scratch
implementation of the same publicly documented architecture (CSP/C2f
backbone, PAN neck, decoupled DFL/cls/kpt head), with state_dict key
names matching the ultralytics ``model.{i}.*`` layout so the SAME
importer path is exercised. Two independent implementations agreeing on
random weights catches conversion and architecture bugs; neither is
derived from the other's code. ultralytics itself is not in this image.
"""

import torch
import torch.nn as nn

REG_MAX = 16
NUM_KPT = 5


class Conv(nn.Module):
    def __init__(self, c1, c2, k=1, s=1):
        super().__init__()
        self.conv = nn.Conv2d(c1, c2, k, s, k // 2, bias=False)
        self.bn = nn.BatchNorm2d(c2, eps=1e-3, momentum=0.03)
        self.act = nn.SiLU()

    def forward(self, x):
        return self.act(self.bn(self.conv(x)))


class Bottleneck(nn.Module):
    def __init__(self, c, shortcut=True):
        super().__init__()
        self.cv1 = Conv(c, c, 3)
        self.cv2 = Conv(c, c, 3)
        self.add = shortcut

    def forward(self, x):
        y = self.cv2(self.cv1(x))
        return x + y if self.add else y


class C2f(nn.Module):
    def __init__(self, c1, c2, n=1, shortcut=False):
        super().__init__()
        self.c = c2 // 2
        self.cv1 = Conv(c1, c2, 1)
        self.cv2 = Conv((2 + n) * self.c, c2, 1)
        self.m = nn.ModuleList(Bottleneck(self.c, shortcut)
                               for _ in range(n))

    def forward(self, x):
        y = list(self.cv1(x).chunk(2, 1))
        for m in self.m:
            y.append(m(y[-1]))
        return self.cv2(torch.cat(y, 1))


class SPPF(nn.Module):
    def __init__(self, c1, c2, k=5):
        super().__init__()
        c_ = c1 // 2
        self.cv1 = Conv(c1, c_, 1)
        self.cv2 = Conv(c_ * 4, c2, 1)
        self.pool = nn.MaxPool2d(k, 1, k // 2)

    def forward(self, x):
        x = self.cv1(x)
        y1 = self.pool(x)
        y2 = self.pool(y1)
        y3 = self.pool(y2)
        return self.cv2(torch.cat([x, y1, y2, y3], 1))


class DFL(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv = nn.Conv2d(REG_MAX, 1, 1, bias=False)
        self.conv.weight.data[:] = torch.arange(
            REG_MAX, dtype=torch.float32).view(1, REG_MAX, 1, 1)
        self.conv.requires_grad_(False)


def _branch(c_in, c_mid, c_out):
    return nn.Sequential(Conv(c_in, c_mid, 3), Conv(c_mid, c_mid, 3),
                         nn.Conv2d(c_mid, c_out, 1))


class Head(nn.Module):
    """Pose-style face head: cv2 box, cv3 cls, cv4 keypoints, per scale."""

    def __init__(self, chs, nc=1):
        super().__init__()
        c2 = max(16, chs[0] // 4, REG_MAX * 4)
        c3 = max(chs[0], min(nc, 100))
        c4 = max(chs[0] // 4, NUM_KPT * 3)
        self.cv2 = nn.ModuleList(_branch(c, c2, 4 * REG_MAX) for c in chs)
        self.cv3 = nn.ModuleList(_branch(c, c3, nc) for c in chs)
        self.cv4 = nn.ModuleList(_branch(c, c4, NUM_KPT * 3) for c in chs)
        self.dfl = DFL()

    def forward(self, feats):
        return [(self.cv2[i](f), self.cv3[i](f), self.cv4[i](f))
                for i, f in enumerate(feats)]


class YoloV8FaceTorch(nn.Module):
    def __init__(self, ch=(16, 32, 64, 128, 256), d=(1, 2, 2, 1), nc=1):
        super().__init__()
        up = nn.Upsample(scale_factor=2, mode="nearest")
        layers = [
            Conv(3, ch[0], 3, 2),            # 0
            Conv(ch[0], ch[1], 3, 2),        # 1
            C2f(ch[1], ch[1], d[0], True),   # 2
            Conv(ch[1], ch[2], 3, 2),        # 3
            C2f(ch[2], ch[2], d[1], True),   # 4
            Conv(ch[2], ch[3], 3, 2),        # 5
            C2f(ch[3], ch[3], d[2], True),   # 6
            Conv(ch[3], ch[4], 3, 2),        # 7
            C2f(ch[4], ch[4], d[3], True),   # 8
            SPPF(ch[4], ch[4]),              # 9
            up,                              # 10
            nn.Identity(),                   # 11 (concat)
            C2f(ch[4] + ch[3], ch[3], d[0]),  # 12
            up,                              # 13
            nn.Identity(),                   # 14 (concat)
            C2f(ch[3] + ch[2], ch[2], d[0]),  # 15
            Conv(ch[2], ch[2], 3, 2),        # 16
            nn.Identity(),                   # 17 (concat)
            C2f(ch[2] + ch[3], ch[3], d[0]),  # 18
            Conv(ch[3], ch[3], 3, 2),        # 19
            nn.Identity(),                   # 20 (concat)
            C2f(ch[3] + ch[4], ch[4], d[0]),  # 21
            Head((ch[2], ch[3], ch[4]), nc),  # 22
        ]
        self.model = nn.ModuleList(layers)

    def forward(self, x):
        m = self.model
        x = m[2](m[1](m[0](x)))
        p3 = m[4](m[3](x))
        p4 = m[6](m[5](p3))
        p5 = m[9](m[8](m[7](p4)))
        n4 = m[12](torch.cat([m[10](p5), p4], 1))
        n3 = m[15](torch.cat([m[13](n4), p3], 1))
        o4 = m[18](torch.cat([m[16](n3), n4], 1))
        o5 = m[21](torch.cat([m[19](o4), p5], 1))
        return m[22]([n3, o4, o5])
