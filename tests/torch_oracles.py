"""Torch oracle models for converter/parity tests.

These are *test fixtures*: compact PyTorch builds of the reference
architectures (same operator graphs; state_dict key layout matches what the
reference trainers save) used purely as numerical oracles for the
Keras/torch -> flax converters. torchvision is unavailable in this
environment, so the ResNet50 is assembled here with torchvision's module
naming (base.conv1, base.layerN.M.convK, base.fc.{1,4}).
"""

import zlib

import numpy as np
import torch
import torch.nn as nn


def seeded_state_dict(model: nn.Module) -> dict:
    """Deterministic weights as a pure function of (key name, shape).

    Because the in-repo oracles reproduce torchvision's state_dict key
    layout exactly, loading this dict into EITHER the oracle or the real
    torchvision model yields identical parameters — so per-stage
    activation traces differ iff the *operator graphs* differ (e.g. the
    ResNet50 V1 vs V1.5 downsample stride placement, round-2 VERDICT
    item 8)."""
    out = {}
    for key, v in model.state_dict().items():
        rng = np.random.RandomState(zlib.crc32(key.encode()) % 2**32)
        if key.endswith('num_batches_tracked'):
            out[key] = torch.zeros_like(v)
        elif key.endswith('running_var'):
            out[key] = torch.from_numpy(
                rng.uniform(0.5, 1.5, v.shape).astype(np.float32))
        else:
            out[key] = torch.from_numpy(
                (rng.randn(*v.shape) * 0.05).astype(np.float32))
    return out


def _summarize(name, x):
    a = x.detach().numpy().astype(np.float64)
    return (name, np.array(a.shape, np.int64),
            np.array([a.mean(), a.std(), np.abs(a).mean()], np.float64))


def resnet50_stage_trace(model: nn.Module, x: np.ndarray):
    """Per-stage (shape, [mean, std, absmean]) trace of a
    torchvision-resnet50-shaped model under eval().

    Works on both OracleResNet50 and torchvision.models.resnet50 (same
    attribute names by construction)."""
    model.eval()
    rows = []
    with torch.no_grad():
        h = torch.from_numpy(x)
        h = model.maxpool(model.relu(model.bn1(model.conv1(h))))
        rows.append(_summarize('stem', h))
        for name in ('layer1', 'layer2', 'layer3', 'layer4'):
            h = getattr(model, name)(h)
            rows.append(_summarize(name, h))
        h = model.avgpool(h).flatten(1)
        rows.append(_summarize('avgpool', h))
        rows.append(_summarize('fc', model.fc(h)))
    return rows


def mobilenet_v2_stage_trace(model: nn.Module, x: np.ndarray):
    """Per-features-block trace of a torchvision-mobilenet_v2-shaped
    model (OracleMobileNetV2 or torchvision.models.mobilenet_v2)."""
    model.eval()
    rows = []
    with torch.no_grad():
        h = torch.from_numpy(x)
        for i, block in enumerate(model.features):
            h = block(h)
            rows.append(_summarize(f'features.{i}', h))
        h = h.mean([2, 3])
        rows.append(_summarize('pool', h))
        rows.append(_summarize('classifier', model.classifier(h)))
    return rows


def projection(d_in, d_out):
    return nn.Sequential(nn.Linear(d_in, d_out), nn.LayerNorm(d_out),
                         nn.ReLU(), nn.Dropout(0.3))


class OracleCrossModalAttention(nn.Module):
    def __init__(self, hidden=256, heads=4):
        super().__init__()
        self.attention = nn.MultiheadAttention(hidden, heads, batch_first=True)
        self.norm = nn.LayerNorm(hidden)
        self.dropout = nn.Dropout(0.1)

    def forward(self, q, kv):
        out, _ = self.attention(q, kv, kv)
        return self.norm(q + self.dropout(out))


class OracleAttentionFusion(nn.Module):
    def __init__(self, dims, hidden=256):
        super().__init__()
        self.projections = nn.ModuleList([projection(d, hidden) for d in dims])
        self.attention = nn.Sequential(
            nn.Linear(hidden * len(dims), hidden), nn.Tanh(),
            nn.Linear(hidden, len(dims)), nn.Softmax(dim=-1))

    def forward(self, feats):
        proj = [p(f) for p, f in zip(self.projections, feats)]
        w = self.attention(torch.cat(proj, -1))
        return (torch.stack(proj, 1) * w.unsqueeze(-1)).sum(1), w


class OracleFusionModel(nn.Module):
    """Mirror of reference inference/multimodal_fusion.py:108-182."""

    def __init__(self, sd=64, td=768, imd=512, nc=7, hidden=256):
        super().__init__()
        self.speech_proj = projection(sd, hidden)
        self.text_proj = projection(td, hidden)
        self.image_proj = projection(imd, hidden)
        self.cross_attn_speech = OracleCrossModalAttention(hidden)
        self.cross_attn_text = OracleCrossModalAttention(hidden)
        self.cross_attn_image = OracleCrossModalAttention(hidden)
        self.attention_fusion = OracleAttentionFusion([hidden] * 3, hidden)
        self.decision_weights = nn.Sequential(
            nn.Linear(nc * 3, 64), nn.ReLU(), nn.Linear(64, 3),
            nn.Softmax(dim=-1))
        self.classifier = nn.Sequential(
            nn.Linear(hidden + nc, hidden), nn.LayerNorm(hidden), nn.ReLU(),
            nn.Dropout(0.4), nn.Linear(hidden, hidden // 2), nn.ReLU(),
            nn.Dropout(0.3), nn.Linear(hidden // 2, nc))

    def forward(self, sf, tf, imf, sp, tp, ip):
        a = self.speech_proj(sf).unsqueeze(1)
        b = self.text_proj(tf).unsqueeze(1)
        c = self.image_proj(imf).unsqueeze(1)
        ae = self.cross_attn_speech(a, torch.cat([b, c], 1)).squeeze(1)
        be = self.cross_attn_text(b, torch.cat([a, c], 1)).squeeze(1)
        ce = self.cross_attn_image(c, torch.cat([a, b], 1)).squeeze(1)
        fused, aw = self.attention_fusion([ae, be, ce])
        preds = torch.cat([sp, tp, ip], -1)
        dw = self.decision_weights(preds)
        wp = (torch.stack([sp, tp, ip], 1) * dw.unsqueeze(-1)).sum(1)
        logits = self.classifier(torch.cat([fused, wp], -1))
        return logits, aw, dw


class OracleBottleneck(nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride=stride, padding=1,
                               bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = downsample
        self.stride = stride

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class OracleResNet50(nn.Module):
    """torchvision-compatible resnet50 skeleton (state_dict key layout)."""

    def __init__(self, num_classes=1000):
        super().__init__()
        self.inplanes = 64
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        self.layer1 = self._make_layer(64, 3)
        self.layer2 = self._make_layer(128, 4, stride=2)
        self.layer3 = self._make_layer(256, 6, stride=2)
        self.layer4 = self._make_layer(512, 3, stride=2)
        self.avgpool = nn.AdaptiveAvgPool2d((1, 1))
        self.fc = nn.Linear(512 * 4, num_classes)

    def _make_layer(self, planes, blocks, stride=1):
        downsample = None
        if stride != 1 or self.inplanes != planes * 4:
            downsample = nn.Sequential(
                nn.Conv2d(self.inplanes, planes * 4, 1, stride=stride,
                          bias=False),
                nn.BatchNorm2d(planes * 4))
        layers = [OracleBottleneck(self.inplanes, planes, stride, downsample)]
        self.inplanes = planes * 4
        layers += [OracleBottleneck(self.inplanes, planes)
                   for _ in range(blocks - 1)]
        return nn.Sequential(*layers)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
        x = self.avgpool(x).flatten(1)
        return self.fc(x)


class OracleImageEmotionModel(nn.Module):
    """Mirror of reference inference/image_inference.py:54-92."""

    def __init__(self, num_classes=7):
        super().__init__()
        self.base = OracleResNet50()
        in_features = self.base.fc.in_features
        self.base.fc = nn.Sequential(
            nn.Dropout(0.5), nn.Linear(in_features, 512), nn.ReLU(),
            nn.Dropout(0.3), nn.Linear(512, num_classes))

    def forward(self, x):
        return self.base(x)


def _cna(inp, oup, k=3, stride=1, groups=1):
    """torchvision Conv2dNormActivation (an nn.Sequential subclass):
    Conv2d -> BatchNorm2d -> ReLU6, key layout {i}.0 / {i}.1."""
    return nn.Sequential(
        nn.Conv2d(inp, oup, k, stride=stride, padding=(k - 1) // 2,
                  groups=groups, bias=False),
        nn.BatchNorm2d(oup), nn.ReLU6(inplace=True))


class OracleInvertedResidual(nn.Module):
    """torchvision mobilenetv2.InvertedResidual key layout (conv.N.M)."""

    def __init__(self, inp, oup, stride, expand_ratio):
        super().__init__()
        hidden = inp * expand_ratio
        self.use_res_connect = stride == 1 and inp == oup
        layers = []
        if expand_ratio != 1:
            layers.append(_cna(inp, hidden, k=1))
        layers += [_cna(hidden, hidden, stride=stride, groups=hidden),
                   nn.Conv2d(hidden, oup, 1, bias=False),
                   nn.BatchNorm2d(oup)]
        self.conv = nn.Sequential(*layers)

    def forward(self, x):
        out = self.conv(x)
        return x + out if self.use_res_connect else out


class OracleMobileNetV2(nn.Module):
    """torchvision-compatible mobilenet_v2 (state_dict key layout)."""

    CFG = [(1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
           (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1)]

    def __init__(self, num_classes=1000):
        super().__init__()
        features = [_cna(3, 32, stride=2)]
        in_ch = 32
        for t, c, n, s in self.CFG:
            for i in range(n):
                features.append(OracleInvertedResidual(
                    in_ch, c, s if i == 0 else 1, t))
                in_ch = c
        features.append(_cna(in_ch, 1280, k=1))
        self.features = nn.Sequential(*features)
        self.classifier = nn.Sequential(nn.Dropout(0.2),
                                        nn.Linear(1280, num_classes))

    def forward(self, x):
        x = self.features(x)
        x = x.mean([2, 3])
        return self.classifier(x)


class OracleMobileNetEmotionModel(nn.Module):
    """MobileNetV2 + the reference's custom-head pattern
    (reference README.md:13 advertises this variant; head pattern from
    reference inference/image_inference.py:54-92)."""

    def __init__(self, num_classes=7):
        super().__init__()
        self.base = OracleMobileNetV2()
        self.base.classifier = nn.Sequential(
            nn.Dropout(0.5), nn.Linear(1280, 512), nn.ReLU(),
            nn.Dropout(0.3), nn.Linear(512, num_classes))

    def forward(self, x):
        return self.base(x)
