"""Independent PyTorch implementation of the OrienMask architecture, used only as a
numerical oracle in golden tests (the reference's published architecture, written
from its paper-level description — conv/BN/leaky stacks with the documented wiring).

This also doubles as a producer of reference-format state_dicts to exercise the
torch->jax weight converter.
"""

import torch
import torch.nn as nn
import torch.nn.functional as F


class TorchCBL(nn.Module):
    """Matches the reference state_dict layout: ``conv_block.{0,1,2}``."""

    def __init__(self, cin, cout, k, stride=1, padding=0):
        super().__init__()
        self.conv_block = nn.Sequential(
            nn.Conv2d(cin, cout, k, stride=stride, padding=padding, bias=False),
            nn.BatchNorm2d(cout),
            nn.LeakyReLU(0.1),
        )

    def forward(self, x):
        return self.conv_block(x)


class TorchDarkBlock(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.conv = nn.Sequential(
            TorchCBL(c * 2, c, 1),
            TorchCBL(c, c * 2, 3, padding=1),
        )

    def forward(self, x):
        return x + self.conv(x)


class TorchDarkNet53(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = TorchCBL(3, 32, 3, padding=1)
        for i, (c, n) in enumerate(zip((32, 64, 128, 256, 512), (1, 2, 8, 8, 4)), start=2):
            layers = [TorchCBL(c, c * 2, 3, stride=2, padding=1)]
            layers += [TorchDarkBlock(c) for _ in range(n)]
            setattr(self, f"conv{i}", nn.Sequential(*layers))

    def forward(self, x):
        x = self.conv1(x)
        x = self.conv2(x)
        x4 = self.conv3(x)
        x8 = self.conv4(x4)
        x16 = self.conv5(x8)
        x32 = self.conv6(x16)
        return x32, x16, x8, x4


def t_neck(cin, cout):
    return nn.Sequential(
        TorchCBL(cin, cout, 1),
        TorchCBL(cout, cout * 2, 3, padding=1),
        TorchCBL(cout * 2, cout, 1),
        TorchCBL(cout, cout * 2, 3, padding=1),
        TorchCBL(cout * 2, cout, 1),
    )


def t_route(cin, cout, up):
    return nn.Sequential(TorchCBL(cin, cout, 1), nn.Upsample(scale_factor=up, mode="nearest"))


def t_bbox_head(cin, cout):
    return nn.Sequential(TorchCBL(cin, cin * 2, 3, padding=1), nn.Conv2d(cin * 2, cout, 1))


def t_orien_head(cin, cout):
    return nn.Sequential(
        TorchCBL(cin, cin * 2, 3, padding=1),
        TorchCBL(cin * 2, cin, 1),
        TorchCBL(cin, cin * 2, 3, padding=1),
        TorchCBL(cin * 2, cin, 1),
        TorchCBL(cin, cin * 2, 3, padding=1),
        nn.Conv2d(cin * 2, cout, 1),
    )


class TorchOrienMaskFPNPlus(nn.Module):
    def __init__(self, num_anchors=3, num_classes=80):
        super().__init__()
        self.num_anchors = num_anchors
        a = num_anchors
        bbox_dim = a * (5 + num_classes)
        self.backbone = TorchDarkNet53()
        self.neck32 = t_neck(1024, 512)
        self.neck16 = t_neck(768, 256)
        self.neck8 = t_neck(384, 128)
        self.neck4 = t_neck(256, 128)
        self.route32 = t_route(512, 256, 2)
        self.route16 = t_route(256, 128, 2)
        self.bbox_head8 = t_bbox_head(128, bbox_dim)
        self.bbox_head16 = t_bbox_head(256, bbox_dim)
        self.bbox_head32 = t_bbox_head(512, bbox_dim)
        self.skip32 = t_route(512, 64, 8)
        self.skip16 = t_route(256, 64, 4)
        self.skip8 = t_route(128, 64, 2)
        self.skip4 = TorchCBL(128, 64, 1)
        self.orien_head = t_orien_head(128, a * 6)

    def forward(self, x):
        x32, x16, x8, x4 = self.backbone(x)
        neck32 = self.neck32(x32)
        neck16 = self.neck16(torch.cat([self.route32(neck32), x16], dim=1))
        neck8 = self.neck8(torch.cat([self.route16(neck16), x8], dim=1))
        bbox32 = self.bbox_head32(neck32)
        bbox16 = self.bbox_head16(neck16)
        bbox8 = self.bbox_head8(neck8)
        oriens = self.neck4(torch.cat(
            [self.skip32(neck32), self.skip16(neck16), self.skip8(neck8), self.skip4(x4)], dim=1))
        oriens = self.orien_head(oriens)
        a2 = self.num_anchors * 2
        return (
            (bbox32, oriens[:, :a2]),
            (bbox16, oriens[:, a2:2 * a2]),
            (bbox8, oriens[:, 2 * a2:]),
        )


def upsample4_bilinear(x):
    return F.interpolate(x, scale_factor=4, mode="bilinear", align_corners=False)


class TorchBasicBlock(nn.Module):
    """torchvision-layout BasicBlock (conv1/bn1/conv2/bn2/downsample)."""

    def __init__(self, cin, planes, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, planes, 3, stride=stride, padding=1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        if stride != 1 or cin != planes:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, planes, 1, stride=stride, bias=False),
                nn.BatchNorm2d(planes),
            )
        else:
            self.downsample = None

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        y = F.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return F.relu(idt + y)


class TorchResNet18(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        for i, (planes, n) in enumerate(zip((64, 128, 256, 512), (2, 2, 2, 2))):
            stride = 1 if i == 0 else 2
            cin = 64 if i == 0 else planes // 2
            blocks = [TorchBasicBlock(cin, planes, stride)]
            blocks += [TorchBasicBlock(planes, planes) for _ in range(n - 1)]
            setattr(self, f"layer{i+1}", nn.Sequential(*blocks))

    def forward(self, x):
        x = self.maxpool(F.relu(self.bn1(self.conv1(x))))
        x4 = self.layer1(x)
        x8 = self.layer2(x4)
        x16 = self.layer3(x8)
        x32 = self.layer4(x16)
        return x32, x16, x8, x4


class TorchOrienMaskBase(nn.Module):
    """The base (non-FPNPlus) variant: orientation path = route8(neck8) + x4."""

    def __init__(self, num_anchors=3, num_classes=80):
        super().__init__()
        self.num_anchors = num_anchors
        a = num_anchors
        bbox_dim = a * (5 + num_classes)
        self.backbone = TorchDarkNet53()
        self.neck32 = t_neck(1024, 512)
        self.neck16 = t_neck(768, 256)
        self.neck8 = t_neck(384, 128)
        self.neck4 = t_neck(192, 128)
        self.route32 = t_route(512, 256, 2)
        self.route16 = t_route(256, 128, 2)
        self.route8 = t_route(128, 64, 2)
        self.bbox_head8 = t_bbox_head(128, bbox_dim)
        self.bbox_head16 = t_bbox_head(256, bbox_dim)
        self.bbox_head32 = t_bbox_head(512, bbox_dim)
        self.orien_head = t_orien_head(128, a * 6)

    def forward(self, x):
        x32, x16, x8, x4 = self.backbone(x)
        neck32 = self.neck32(x32)
        neck16 = self.neck16(torch.cat([self.route32(neck32), x16], dim=1))
        neck8 = self.neck8(torch.cat([self.route16(neck16), x8], dim=1))
        bbox32 = self.bbox_head32(neck32)
        bbox16 = self.bbox_head16(neck16)
        bbox8 = self.bbox_head8(neck8)
        oriens = self.orien_head(self.neck4(torch.cat([self.route8(neck8), x4], dim=1)))
        a2 = self.num_anchors * 2
        return (
            (bbox32, oriens[:, :a2]),
            (bbox16, oriens[:, a2:2 * a2]),
            (bbox8, oriens[:, 2 * a2:]),
        )
