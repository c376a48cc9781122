"""From-scratch torch-CPU oracle for PoseResNet parity tests.

Written against the Simple Baselines architecture spec (arXiv:1804.06208
section 3: ResNet backbone + 3 deconv layers + 1x1 conv). State-dict names
follow the torch lineage conventions (conv1/bn1/layerL.B.*/deconv_layers.N/
final_layer) so utils/torch_convert.py can be tested against it.
NOT ported from the reference (mount empty, SURVEY.md section 0).
"""

import torch
import torch.nn as nn


class Bottleneck(nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = downsample
        self.stride = stride

    def forward(self, x):
        r = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            r = self.downsample(x)
        return self.relu(out + r)


SPECS = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3), 152: (3, 8, 36, 3)}


class PoseResNetTorch(nn.Module):
    def __init__(self, num_layers=50, num_joints=17, deconv_with_bias=False):
        super().__init__()
        layers = SPECS[num_layers]
        self.inplanes = 64
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        self.layer1 = self._make_layer(64, layers[0])
        self.layer2 = self._make_layer(128, layers[1], 2)
        self.layer3 = self._make_layer(256, layers[2], 2)
        self.layer4 = self._make_layer(512, layers[3], 2)

        mods = []
        inp = 512 * 4
        for _ in range(3):
            mods += [nn.ConvTranspose2d(inp, 256, 4, 2, 1, bias=deconv_with_bias),
                     nn.BatchNorm2d(256), nn.ReLU(inplace=True)]
            inp = 256
        self.deconv_layers = nn.Sequential(*mods)
        self.final_layer = nn.Conv2d(256, num_joints, 1)

    def _make_layer(self, planes, blocks, stride=1):
        downsample = None
        if stride != 1 or self.inplanes != planes * 4:
            downsample = nn.Sequential(
                nn.Conv2d(self.inplanes, planes * 4, 1, stride, bias=False),
                nn.BatchNorm2d(planes * 4))
        layers = [Bottleneck(self.inplanes, planes, stride, downsample)]
        self.inplanes = planes * 4
        for _ in range(1, blocks):
            layers.append(Bottleneck(self.inplanes, planes))
        return nn.Sequential(*layers)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
        return self.final_layer(self.deconv_layers(x))


def random_pose_resnet(num_layers=50, seed=0):
    torch.manual_seed(seed)
    m = PoseResNetTorch(num_layers)
    # randomize BN stats too so parity tests exercise them
    with torch.no_grad():
        for mod in m.modules():
            if isinstance(mod, nn.BatchNorm2d):
                mod.running_mean.normal_(0, 0.1)
                mod.running_var.uniform_(0.5, 1.5)
    m.eval()
    return m
