"""From-scratch torch-CPU oracles for FlowNet parity tests.

Written against the FlowNet / FlowNet2 papers (arXiv:1504.06852,
arXiv:1612.01925) with flownet2-pytorch lineage naming (Sequential-wrapped
convs, bare predict_flow / upsampled_flow modules) so
utils/torch_convert.py can be tested against them. The correlation layer is
a naive python-loop torch implementation of the CUDA kernel's contract.
NOT ported from the reference (mount empty, SURVEY.md section 0).
"""

import torch
import torch.nn as nn
import torch.nn.functional as F


def conv(in_ch, out_ch, k=3, stride=1):
    return nn.Sequential(
        nn.Conv2d(in_ch, out_ch, k, stride, (k - 1) // 2, bias=True),
        nn.LeakyReLU(0.1, inplace=True))


def i_conv(in_ch, out_ch, k=3):
    return nn.Sequential(nn.Conv2d(in_ch, out_ch, k, 1, (k - 1) // 2, bias=True))


def deconv(in_ch, out_ch):
    return nn.Sequential(
        nn.ConvTranspose2d(in_ch, out_ch, 4, 2, 1, bias=True),
        nn.LeakyReLU(0.1, inplace=True))


def predict_flow(in_ch):
    return nn.Conv2d(in_ch, 2, 3, 1, 1, bias=True)


def upflow():
    return nn.ConvTranspose2d(2, 2, 4, 2, 1, bias=False)


def correlation_torch(f1, f2, md=20, s2=2):
    """Naive correlation: NCHW in, (N, D*D, H, W) out, mean over channels."""
    n, c, h, w = f1.shape
    disps = list(range(-md, md + 1, s2))
    f2p = F.pad(f2, (md, md, md, md))
    outs = []
    for dy in disps:
        for dx in disps:
            shifted = f2p[:, :, md + dy: md + dy + h, md + dx: md + dx + w]
            outs.append((f1 * shifted).sum(1) / c)
    return torch.stack(outs, dim=1)


class RefinementTrunk(nn.Module):
    """Shared FlowNetS/C decode path; owner registers modules at top level."""

    def __init__(self, owner):
        super().__init__()
        owner.predict_flow6 = predict_flow(1024)
        owner.upsampled_flow6_to_5 = upflow()
        owner.deconv5 = deconv(1024, 512)
        owner.predict_flow5 = predict_flow(1026)
        owner.upsampled_flow5_to_4 = upflow()
        owner.deconv4 = deconv(1026, 256)
        owner.predict_flow4 = predict_flow(770)
        owner.upsampled_flow4_to_3 = upflow()
        owner.deconv3 = deconv(770, 128)
        owner.predict_flow3 = predict_flow(386)
        owner.upsampled_flow3_to_2 = upflow()
        owner.deconv2 = deconv(386, 64)
        owner.predict_flow2 = predict_flow(194)
        self.owner = [owner]  # avoid registering twice

    def forward(self, out_conv2, out_conv3, out_conv4, out_conv5, out_conv6):
        o = self.owner[0]
        flow6 = o.predict_flow6(out_conv6)
        flow6_up = o.upsampled_flow6_to_5(flow6)
        out_deconv5 = o.deconv5(out_conv6)
        concat5 = torch.cat([out_conv5, out_deconv5, flow6_up], 1)
        flow5 = o.predict_flow5(concat5)
        flow5_up = o.upsampled_flow5_to_4(flow5)
        out_deconv4 = o.deconv4(concat5)
        concat4 = torch.cat([out_conv4, out_deconv4, flow5_up], 1)
        flow4 = o.predict_flow4(concat4)
        flow4_up = o.upsampled_flow4_to_3(flow4)
        out_deconv3 = o.deconv3(concat4)
        concat3 = torch.cat([out_conv3, out_deconv3, flow4_up], 1)
        flow3 = o.predict_flow3(concat3)
        flow3_up = o.upsampled_flow3_to_2(flow3)
        out_deconv2 = o.deconv2(concat3)
        concat2 = torch.cat([out_conv2, out_deconv2, flow3_up], 1)
        return o.predict_flow2(concat2)


class FlowNetSTorch(nn.Module):
    def __init__(self, in_ch=6):
        super().__init__()
        self.conv1 = conv(in_ch, 64, 7, 2)
        self.conv2 = conv(64, 128, 5, 2)
        self.conv3 = conv(128, 256, 5, 2)
        self.conv3_1 = conv(256, 256)
        self.conv4 = conv(256, 512, 3, 2)
        self.conv4_1 = conv(512, 512)
        self.conv5 = conv(512, 512, 3, 2)
        self.conv5_1 = conv(512, 512)
        self.conv6 = conv(512, 1024, 3, 2)
        self.conv6_1 = conv(1024, 1024)
        self.trunk = RefinementTrunk(self)

    def forward(self, x):
        out_conv2 = self.conv2(self.conv1(x))
        out_conv3 = self.conv3_1(self.conv3(out_conv2))
        out_conv4 = self.conv4_1(self.conv4(out_conv3))
        out_conv5 = self.conv5_1(self.conv5(out_conv4))
        out_conv6 = self.conv6_1(self.conv6(out_conv5))
        return self.trunk(out_conv2, out_conv3, out_conv4, out_conv5,
                          out_conv6)


class FlowNetCTorch(nn.Module):
    def __init__(self, md=20, s2=2):
        super().__init__()
        self.md, self.s2 = md, s2
        d = len(range(-md, md + 1, s2))
        self.conv1 = conv(3, 64, 7, 2)
        self.conv2 = conv(64, 128, 5, 2)
        self.conv3 = conv(128, 256, 5, 2)
        self.conv_redir = conv(256, 32, 1, 1)
        self.conv3_1 = conv(32 + d * d, 256)
        self.conv4 = conv(256, 512, 3, 2)
        self.conv4_1 = conv(512, 512)
        self.conv5 = conv(512, 512, 3, 2)
        self.conv5_1 = conv(512, 512)
        self.conv6 = conv(512, 1024, 3, 2)
        self.conv6_1 = conv(1024, 1024)
        self.trunk = RefinementTrunk(self)

    def forward(self, x):
        x1, x2 = x[:, :3], x[:, 3:]
        out_conv2a = self.conv2(self.conv1(x1))
        out_conv3a = self.conv3(out_conv2a)
        out_conv3b = self.conv3(self.conv2(self.conv1(x2)))
        corr = F.leaky_relu(
            correlation_torch(out_conv3a, out_conv3b, self.md, self.s2), 0.1)
        redir = self.conv_redir(out_conv3a)
        out_conv3 = self.conv3_1(torch.cat([redir, corr], 1))
        out_conv4 = self.conv4_1(self.conv4(out_conv3))
        out_conv5 = self.conv5_1(self.conv5(out_conv4))
        out_conv6 = self.conv6_1(self.conv6(out_conv5))
        return self.trunk(out_conv2a, out_conv3, out_conv4, out_conv5,
                          out_conv6)


class FlowNetSDTorch(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv0 = conv(6, 64)
        self.conv1 = conv(64, 64, 3, 2)
        self.conv1_1 = conv(64, 128)
        self.conv2 = conv(128, 128, 3, 2)
        self.conv2_1 = conv(128, 128)
        self.conv3 = conv(128, 256, 3, 2)
        self.conv3_1 = conv(256, 256)
        self.conv4 = conv(256, 512, 3, 2)
        self.conv4_1 = conv(512, 512)
        self.conv5 = conv(512, 512, 3, 2)
        self.conv5_1 = conv(512, 512)
        self.conv6 = conv(512, 1024, 3, 2)
        self.conv6_1 = conv(1024, 1024)
        self.predict_flow6 = predict_flow(1024)
        self.upsampled_flow6_to_5 = upflow()
        self.deconv5 = deconv(1024, 512)
        self.inter_conv5 = i_conv(1026, 512)
        self.predict_flow5 = predict_flow(512)
        self.upsampled_flow5_to_4 = upflow()
        self.deconv4 = deconv(1026, 256)
        self.inter_conv4 = i_conv(770, 256)
        self.predict_flow4 = predict_flow(256)
        self.upsampled_flow4_to_3 = upflow()
        self.deconv3 = deconv(770, 128)
        self.inter_conv3 = i_conv(386, 128)
        self.predict_flow3 = predict_flow(128)
        self.upsampled_flow3_to_2 = upflow()
        self.deconv2 = deconv(386, 64)
        self.inter_conv2 = i_conv(194, 64)
        self.predict_flow2 = predict_flow(64)

    def forward(self, x):
        out_conv0 = self.conv0(x)
        out_conv1 = self.conv1_1(self.conv1(out_conv0))
        out_conv2 = self.conv2_1(self.conv2(out_conv1))
        out_conv3 = self.conv3_1(self.conv3(out_conv2))
        out_conv4 = self.conv4_1(self.conv4(out_conv3))
        out_conv5 = self.conv5_1(self.conv5(out_conv4))
        out_conv6 = self.conv6_1(self.conv6(out_conv5))
        flow6 = self.predict_flow6(out_conv6)
        flow6_up = self.upsampled_flow6_to_5(flow6)
        out_deconv5 = self.deconv5(out_conv6)
        concat5 = torch.cat([out_conv5, out_deconv5, flow6_up], 1)
        flow5 = self.predict_flow5(self.inter_conv5(concat5))
        flow5_up = self.upsampled_flow5_to_4(flow5)
        out_deconv4 = self.deconv4(concat5)
        concat4 = torch.cat([out_conv4, out_deconv4, flow5_up], 1)
        flow4 = self.predict_flow4(self.inter_conv4(concat4))
        flow4_up = self.upsampled_flow4_to_3(flow4)
        out_deconv3 = self.deconv3(concat4)
        concat3 = torch.cat([out_conv3, out_deconv3, flow4_up], 1)
        flow3 = self.predict_flow3(self.inter_conv3(concat3))
        flow3_up = self.upsampled_flow3_to_2(flow3)
        out_deconv2 = self.deconv2(concat3)
        concat2 = torch.cat([out_conv2, out_deconv2, flow3_up], 1)
        return self.predict_flow2(self.inter_conv2(concat2))


class FlowNetFusionTorch(nn.Module):
    """FlowNet2 fusion net oracle (11-ch input, full-res 2-ch flow out)."""

    def __init__(self):
        super().__init__()
        self.conv0 = conv(11, 64)
        self.conv1 = conv(64, 64, 3, 2)
        self.conv1_1 = conv(64, 128)
        self.conv2 = conv(128, 128, 3, 2)
        self.conv2_1 = conv(128, 128)
        self.predict_flow2 = predict_flow(128)
        self.upsampled_flow2_to_1 = upflow()
        self.deconv1 = deconv(128, 32)
        self.inter_conv1 = i_conv(162, 32)
        self.predict_flow1 = predict_flow(32)
        self.upsampled_flow1_to_0 = upflow()
        self.deconv0 = deconv(162, 16)
        self.inter_conv0 = i_conv(82, 16)
        self.predict_flow0 = predict_flow(16)

    def forward(self, x):
        out_conv0 = self.conv0(x)
        out_conv1 = self.conv1_1(self.conv1(out_conv0))
        out_conv2 = self.conv2_1(self.conv2(out_conv1))
        flow2 = self.predict_flow2(out_conv2)
        flow2_up = self.upsampled_flow2_to_1(flow2)
        out_deconv1 = self.deconv1(out_conv2)
        concat1 = torch.cat([out_conv1, out_deconv1, flow2_up], 1)
        flow1 = self.predict_flow1(self.inter_conv1(concat1))
        flow1_up = self.upsampled_flow1_to_0(flow1)
        out_deconv0 = self.deconv0(concat1)
        concat0 = torch.cat([out_conv0, out_deconv0, flow1_up], 1)
        return self.predict_flow0(self.inter_conv0(concat0))


def resample2d_torch(img, flow):
    """Bilinear warp twin of ops/warp.resample2d: sample img (N, C, H, W) at
    (x + u, y + v), sample coords clamped to the valid range (the CUDA
    kernel's edge-clamp contract)."""
    n, c, h, w = img.shape
    ys, xs = torch.meshgrid(torch.arange(h, dtype=torch.float32),
                            torch.arange(w, dtype=torch.float32),
                            indexing="ij")
    sx = (xs.unsqueeze(0) + flow[:, 0]).clamp(0.0, w - 1.0)
    sy = (ys.unsqueeze(0) + flow[:, 1]).clamp(0.0, h - 1.0)
    x0 = sx.floor()
    y0 = sy.floor()
    wx = (sx - x0).unsqueeze(1)
    wy = (sy - y0).unsqueeze(1)
    x0i = x0.long()
    y0i = y0.long()
    x1i = (x0i + 1).clamp(max=w - 1)
    y1i = (y0i + 1).clamp(max=h - 1)

    def gather(yi, xi):
        idx = (yi * w + xi).view(n, 1, -1).expand(n, c, h * w)
        return img.reshape(n, c, -1).gather(2, idx).view(n, c, h, w)

    top = gather(y0i, x0i) * (1 - wx) + gather(y0i, x1i) * wx
    bot = gather(y1i, x0i) * (1 - wx) + gather(y1i, x1i) * wx
    return top * (1 - wy) + bot * wy


def channelnorm_torch(x):
    return torch.sqrt((x * x).sum(1, keepdim=True))


def upsample4_torch(x):
    return F.interpolate(x, scale_factor=4, mode="bilinear",
                         align_corners=False)


class FlowNet2Torch(nn.Module):
    """Full cascade oracle: C -> warp/brightness-err -> S1 -> S2 || SD ->
    Fusion, with the div_flow conventions of models/flownet.FlowNet2
    (the FlowNet2 paper's stacking recipe, arXiv:1612.01925 section 3)."""

    def __init__(self, div_flow=20.0, md=20, s2=2):
        super().__init__()
        self.div_flow = div_flow
        self.flownetc = FlowNetCTorch(md=md, s2=s2)
        self.flownets_1 = FlowNetSTorch(in_ch=12)
        self.flownets_2 = FlowNetSTorch(in_ch=12)
        self.flownets_d = FlowNetSDTorch()
        self.flownetfusion = FlowNetFusionTorch()

    def forward(self, x):
        img1, img2 = x[:, :3], x[:, 3:]
        flow_c = upsample4_torch(self.flownetc(x) * self.div_flow)

        def stage_input(flow_full):
            warped = resample2d_torch(img2, flow_full)
            err = channelnorm_torch(img1 - warped)
            return torch.cat([x, warped, flow_full / self.div_flow, err], 1)

        flow_s1 = upsample4_torch(
            self.flownets_1(stage_input(flow_c)) * self.div_flow)
        flow_s2 = upsample4_torch(
            self.flownets_2(stage_input(flow_s1)) * self.div_flow)
        flow_sd = upsample4_torch(self.flownets_d(x) / self.div_flow)

        norm_sd = channelnorm_torch(flow_sd)
        norm_s2 = channelnorm_torch(flow_s2)
        err_sd = channelnorm_torch(img1 - resample2d_torch(img2, flow_sd))
        err_s2 = channelnorm_torch(img1 - resample2d_torch(img2, flow_s2))
        fuse = torch.cat([img1, flow_sd, flow_s2, norm_sd, norm_s2,
                          err_sd, err_s2], 1)
        return self.flownetfusion(fuse)


class FlowNet2CSSTorch(nn.Module):
    """Truncated cascade oracle: C -> S1 (stages=1, FlowNet2-CS) or
    C -> S1 -> S2 (stages=2, FlowNet2-CSS); same inter-stage recipe as
    FlowNet2Torch, output = last S stage's flow at full resolution."""

    def __init__(self, stages=2, div_flow=20.0, md=20, s2=2):
        super().__init__()
        self.div_flow = div_flow
        self.stages = stages
        self.flownetc = FlowNetCTorch(md=md, s2=s2)
        self.flownets_1 = FlowNetSTorch(in_ch=12)
        if stages >= 2:
            self.flownets_2 = FlowNetSTorch(in_ch=12)

    def forward(self, x):
        img1, img2 = x[:, :3], x[:, 3:]
        flow = upsample4_torch(self.flownetc(x) * self.div_flow)

        def stage_input(flow_full):
            warped = resample2d_torch(img2, flow_full)
            err = channelnorm_torch(img1 - warped)
            return torch.cat([x, warped, flow_full / self.div_flow, err], 1)

        for i in range(self.stages):
            s = getattr(self, f"flownets_{i + 1}")
            flow = upsample4_torch(s(stage_input(flow)) * self.div_flow)
        return flow


def random_net(cls, seed=0, **kw):
    torch.manual_seed(seed)
    m = cls(**kw)
    m.eval()
    return m
