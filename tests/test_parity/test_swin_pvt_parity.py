"""Swin-T / PVT-tiny pretrained-checkpoint converter parity.

Builds torch models with the OFFICIAL upstream state-dict layouts — the
microsoft Swin classification layout (`layers.{i}.blocks.{j}.attn.qkv`,
`downsample.{reduction,norm}`, `relative_position_bias_table`) and the
whybeyoung/PVT v1 layout (`patch_embed{s}.proj`, `pos_embed{s}`,
`block{s}.{j}.attn.{q,kv,sr,norm}`) — randomizes their weights, converts the
state dicts through `utils/checkpoint.py:convert_torch_swin` /
`convert_torch_pvt` (reference `mmdet/models/utils/ckpt_convert.py:85,12`),
and asserts all stage feature maps agree with our flax trunks.

This is the path real ImageNet-pretrained Swin/PVT weights take into the
`configs/swin/`, `configs/pvt/` and `configs/da/deepalign_swin_t_c2f.py`
rows (BASELINE.json target config #5).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip('torch')
from torch import nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

from unsupervised_domain_adaptation_object_detection_implementation_tpu.models.backbones.swin import (  # noqa: E402
    SwinTransformer)
from unsupervised_domain_adaptation_object_detection_implementation_tpu.models.backbones.pvt import (  # noqa: E402
    PVT)
from unsupervised_domain_adaptation_object_detection_implementation_tpu.utils.checkpoint import (  # noqa: E402
    convert_torch_pvt, convert_torch_swin)


# --------------------------- torch Swin (official microsoft layout) --------

def _win_part(x, ws):
    b, h, w, c = x.shape
    x = x.view(b, h // ws, ws, w // ws, ws, c)
    return x.permute(0, 1, 3, 2, 4, 5).reshape(-1, ws, ws, c)


def _win_merge(x, ws, h, w):
    b = x.shape[0] // (h * w // ws // ws)
    x = x.view(b, h // ws, w // ws, ws, ws, -1)
    return x.permute(0, 1, 3, 2, 4, 5).reshape(b, h, w, -1)


class _TWindowAttention(tnn.Module):
    def __init__(self, dim, ws, heads):
        super().__init__()
        self.dim, self.ws, self.heads = dim, ws, heads
        self.scale = (dim // heads) ** -0.5
        self.relative_position_bias_table = tnn.Parameter(
            torch.zeros((2 * ws - 1) ** 2, heads))
        coords = torch.stack(torch.meshgrid(
            torch.arange(ws), torch.arange(ws), indexing='ij'))
        coords = torch.flatten(coords, 1)
        rel = coords[:, :, None] - coords[:, None, :]
        rel = rel.permute(1, 2, 0).contiguous()
        rel[:, :, 0] += ws - 1
        rel[:, :, 1] += ws - 1
        rel[:, :, 0] *= 2 * ws - 1
        self.register_buffer('relative_position_index', rel.sum(-1))
        self.qkv = tnn.Linear(dim, dim * 3)
        self.proj = tnn.Linear(dim, dim)

    def forward(self, x, mask=None):
        b_, n, c = x.shape
        qkv = self.qkv(x).reshape(b_, n, 3, self.heads,
                                  c // self.heads).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q * self.scale) @ k.transpose(-2, -1)
        bias = self.relative_position_bias_table[
            self.relative_position_index.view(-1)].view(n, n, -1)
        attn = attn + bias.permute(2, 0, 1).unsqueeze(0)
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.view(b_ // nw, nw, self.heads, n, n) \
                + mask.unsqueeze(1).unsqueeze(0)
            attn = attn.view(-1, self.heads, n, n)
        attn = attn.softmax(dim=-1)
        x = (attn @ v).transpose(1, 2).reshape(b_, n, c)
        return self.proj(x)


class _TSwinBlock(tnn.Module):
    def __init__(self, dim, heads, ws, shift):
        super().__init__()
        self.dim, self.ws, self.shift = dim, ws, shift
        self.norm1 = tnn.LayerNorm(dim)
        self.attn = _TWindowAttention(dim, ws, heads)
        self.norm2 = tnn.LayerNorm(dim)
        self.mlp = tnn.Sequential()
        self.mlp.fc1 = tnn.Linear(dim, dim * 4)
        self.mlp.fc2 = tnn.Linear(dim * 4, dim)

    def forward(self, x, h, w, mask):
        b, n, c = x.shape
        res = x
        x = self.norm1(x).view(b, h, w, c)
        if self.shift:
            x = torch.roll(x, (-self.shift, -self.shift), dims=(1, 2))
        xw = _win_part(x, self.ws).view(-1, self.ws * self.ws, c)
        xw = self.attn(xw, mask if self.shift else None)
        x = _win_merge(xw.view(-1, self.ws, self.ws, c), self.ws, h, w)
        if self.shift:
            x = torch.roll(x, (self.shift, self.shift), dims=(1, 2))
        x = res + x.view(b, n, c)
        y = self.mlp.fc2(F.gelu(self.mlp.fc1(self.norm2(x))))
        return x + y


class _TPatchMerging(tnn.Module):
    def __init__(self, dim):
        super().__init__()
        self.reduction = tnn.Linear(4 * dim, 2 * dim, bias=False)
        self.norm = tnn.LayerNorm(4 * dim)

    def forward(self, x, h, w):
        b, n, c = x.shape
        x = x.view(b, h, w, c)
        x0 = x[:, 0::2, 0::2]
        x1 = x[:, 1::2, 0::2]
        x2 = x[:, 0::2, 1::2]
        x3 = x[:, 1::2, 1::2]
        x = torch.cat([x0, x1, x2, x3], -1).view(b, -1, 4 * c)
        return self.reduction(self.norm(x))


def _shift_attn_mask(h, w, ws, shift):
    img = torch.zeros(1, h, w, 1)
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wsl in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img[:, hs, wsl] = cnt
            cnt += 1
    win = _win_part(img, ws).view(-1, ws * ws)
    mask = win.unsqueeze(1) - win.unsqueeze(2)
    return mask.masked_fill(mask != 0, -100.0).masked_fill(mask == 0, 0.0)


class _TSwinT(tnn.Module):
    """Official-layout Swin with configurable tiny dims."""

    def __init__(self, embed=24, depths=(2, 2, 2), heads=(2, 4, 8), ws=7):
        super().__init__()
        self.ws = ws
        self.patch_embed = tnn.Module()
        self.patch_embed.proj = tnn.Conv2d(3, embed, 4, stride=4)
        self.patch_embed.norm = tnn.LayerNorm(embed)
        self.layers = tnn.ModuleList()
        dim = embed
        for i, d in enumerate(depths):
            layer = tnn.Module()
            layer.blocks = tnn.ModuleList([
                _TSwinBlock(dim, heads[i], ws, 0 if j % 2 == 0 else ws // 2)
                for j in range(d)])
            if i < len(depths) - 1:
                layer.downsample = _TPatchMerging(dim)
                dim *= 2
            self.layers.append(layer)

    def forward(self, x):
        x = self.patch_embed.proj(x)
        b, c, h, w = x.shape
        x = x.flatten(2).transpose(1, 2)
        x = self.patch_embed.norm(x)
        outs = []
        for layer in self.layers:
            mask = _shift_attn_mask(h, w, self.ws, self.ws // 2)
            for blk in layer.blocks:
                x = blk(x, h, w, mask)
            outs.append(x.view(b, h, w, -1))
            if hasattr(layer, 'downsample'):
                x = layer.downsample(x, h, w)
                h, w = h // 2, w // 2
        return outs


def test_swin_converter_feature_parity():
    torch.manual_seed(0)
    depths, heads, embed = (2, 2, 2), (2, 4, 8), 24
    tmodel = _TSwinT(embed=embed, depths=depths, heads=heads).eval()
    # randomize everything incl. bias tables (seeded, non-trivial scale)
    with torch.no_grad():
        for p in tmodel.parameters():
            p.copy_(torch.randn_like(p) * 0.05)

    x = torch.randn(1, 3, 112, 112)
    with torch.no_grad():
        touts = tmodel(x)

    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    tree = convert_torch_swin(sd)

    fmodel = SwinTransformer(embed_dims=embed, depths=depths,
                             num_heads=heads, out_indices=(0, 1, 2))
    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    variables = fmodel.init(jax.random.PRNGKey(0), xj)
    params = dict(variables['params'])
    # graft converted weights over the init tree (out_norm{i} has no
    # pretrained counterpart -> identity for the comparison)
    for i in range(3):
        on = params[f'out_norm{i}']
        params[f'out_norm{i}'] = {'scale': jnp.ones_like(on['scale']),
                                  'bias': jnp.zeros_like(on['bias'])}

    def graft(dst, src):
        for k, v in src.items():
            assert k in dst, f'converted key {k} missing from flax tree'
            if isinstance(v, dict):
                graft(dst[k], v)
            else:
                assert dst[k].shape == np.shape(v), \
                    f'{k}: {dst[k].shape} vs {np.shape(v)}'
                dst[k] = jnp.asarray(v)

    graft(params, tree['params'])
    fouts = fmodel.apply({'params': params}, xj, return_all_stages=True)

    for i, (t, f) in enumerate(zip(touts, fouts)):
        t = t.numpy()
        # undo the fresh out_norm LayerNorm: compare pre-norm via stats —
        # out_norm was reset to identity-scale/zero-bias, but LayerNorm
        # still normalizes; normalize the torch side the same way.
        mu = t.mean(-1, keepdims=True)
        var = t.var(-1, keepdims=True)
        t = (t - mu) / np.sqrt(var + 1e-6)
        np.testing.assert_allclose(np.asarray(f), t, atol=5e-3,
                                   err_msg=f'stage {i}')


def test_swin_merge_reorder_is_permutation():
    """The 4-block reorder must be an involution-consistent permutation:
    applying it to an arange reproduces official→ours index mapping."""
    from unsupervised_domain_adaptation_object_detection_implementation_tpu.utils.checkpoint import (  # noqa: E501
        _swin_merge_reorder)
    v = np.arange(8.0)           # 4 blocks of 2: [0 1 |2 3 |4 5 |6 7]
    out = _swin_merge_reorder(v)
    np.testing.assert_array_equal(out, [0, 1, 4, 5, 2, 3, 6, 7])


# --------------------------- torch PVT v1 (official layout) ----------------

class _TPVTAttn(tnn.Module):
    def __init__(self, dim, heads, sr):
        super().__init__()
        self.heads, self.sr_ratio = heads, sr
        self.scale = (dim // heads) ** -0.5
        self.q = tnn.Linear(dim, dim)
        self.kv = tnn.Linear(dim, dim * 2)
        self.proj = tnn.Linear(dim, dim)
        if sr > 1:
            self.sr = tnn.Conv2d(dim, dim, sr, stride=sr)
            self.norm = tnn.LayerNorm(dim)

    def forward(self, x, h, w):
        b, n, c = x.shape
        q = self.q(x).reshape(b, n, self.heads, c // self.heads)
        q = q.permute(0, 2, 1, 3)
        if self.sr_ratio > 1:
            x_ = x.permute(0, 2, 1).reshape(b, c, h, w)
            x_ = self.sr(x_).reshape(b, c, -1).permute(0, 2, 1)
            x_ = self.norm(x_)
        else:
            x_ = x
        kv = self.kv(x_).reshape(b, -1, 2, self.heads, c // self.heads)
        kv = kv.permute(2, 0, 3, 1, 4)
        k, v = kv[0], kv[1]
        attn = (q @ k.transpose(-2, -1)) * self.scale
        attn = attn.softmax(dim=-1)
        x = (attn @ v).transpose(1, 2).reshape(b, n, c)
        return self.proj(x)


class _TPVTBlock(tnn.Module):
    def __init__(self, dim, heads, mlp_ratio, sr):
        super().__init__()
        self.norm1 = tnn.LayerNorm(dim)
        self.attn = _TPVTAttn(dim, heads, sr)
        self.norm2 = tnn.LayerNorm(dim)
        self.mlp = tnn.Module()
        self.mlp.fc1 = tnn.Linear(dim, dim * mlp_ratio)
        self.mlp.fc2 = tnn.Linear(dim * mlp_ratio, dim)

    def forward(self, x, h, w):
        x = x + self.attn(self.norm1(x), h, w)
        return x + self.mlp.fc2(F.gelu(self.mlp.fc1(self.norm2(x))))


class _TPVT(tnn.Module):
    """Official-naming PVT v1 with per-stage norms (v2-style norm{s} rows,
    exercising the out_norm mapping; our trunk norms every stage like the
    reference mmdet PVT does)."""

    def __init__(self, dims=(16, 32), depths=(2, 2), heads=(1, 2),
                 srs=(8, 4), mlps=(4, 4), img=64):
        super().__init__()
        self.depths = depths
        grid = img // 4
        for s, dim in enumerate(dims, start=1):
            pe = tnn.Module()
            k = 4 if s == 1 else 2
            pe.proj = tnn.Conv2d(3 if s == 1 else dims[s - 2], dim, k,
                                 stride=k)
            pe.norm = tnn.LayerNorm(dim)
            setattr(self, f'patch_embed{s}', pe)
            setattr(self, f'pos_embed{s}',
                    tnn.Parameter(torch.zeros(1, grid * grid, dim)))
            grid //= 2
            setattr(self, f'block{s}', tnn.ModuleList([
                _TPVTBlock(dim, heads[s - 1], mlps[s - 1], srs[s - 1])
                for _ in range(depths[s - 1])]))
            setattr(self, f'norm{s}', tnn.LayerNorm(dim))

    def forward(self, x):
        outs = []
        b = x.shape[0]
        for s in range(1, len(self.depths) + 1):
            pe = getattr(self, f'patch_embed{s}')
            x = pe.proj(x)
            _, c, h, w = x.shape
            x = pe.norm(x.flatten(2).transpose(1, 2))
            x = x + getattr(self, f'pos_embed{s}')
            for blk in getattr(self, f'block{s}'):
                x = blk(x, h, w)
            x = getattr(self, f'norm{s}')(x)
            x = x.reshape(b, h, w, c)
            outs.append(x)
            x = x.permute(0, 3, 1, 2)
        return outs


def test_pvt_converter_feature_parity():
    torch.manual_seed(1)
    dims, depths, heads, srs = (16, 32), (2, 2), (1, 2), (8, 4)
    tmodel = _TPVT(dims=dims, depths=depths, heads=heads, srs=srs).eval()
    with torch.no_grad():
        for p in tmodel.parameters():
            p.copy_(torch.randn_like(p) * 0.05)

    x = torch.randn(1, 3, 64, 64)
    with torch.no_grad():
        touts = tmodel(x)

    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    tree = convert_torch_pvt(sd)

    fmodel = PVT(embed_dims=dims, depths=depths, num_heads=heads,
                 sr_ratios=srs, mlp_ratios=(4, 4), out_indices=(0, 1))
    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    variables = fmodel.init(jax.random.PRNGKey(0), xj)
    params = dict(variables['params'])

    def graft(dst, src):
        for k, v in src.items():
            assert k in dst, f'converted key {k} missing from flax tree'
            if isinstance(v, dict):
                graft(dst[k], v)
            else:
                assert dst[k].shape == np.shape(v), \
                    f'{k}: {dst[k].shape} vs {np.shape(v)}'
                dst[k] = jnp.asarray(v)

    graft(params, tree['params'])
    fouts = fmodel.apply({'params': params}, xj)
    for i, (t, f) in enumerate(zip(touts, fouts)):
        np.testing.assert_allclose(np.asarray(f), t.numpy(), atol=5e-3,
                                   err_msg=f'stage {i}')


def test_pvt_pos_embed_cls_token_strip_and_resize():
    """Stage-4 pos_embed with a leading cls token (1+7*7 rows) is stripped
    to the 7x7 grid; load-time bilinear resize handles other grids."""
    sd = {'pos_embed4': np.random.RandomState(0).randn(1, 50, 8)
          .astype(np.float32)}
    tree = convert_torch_pvt(sd)
    assert tree['params']['pos_embed3'].shape == (1, 7, 7, 8)
    # resize path (as load_pretrained_backbone merge does)
    resized = jax.image.resize(tree['params']['pos_embed3'],
                               (1, 12, 20, 8), 'bilinear')
    assert resized.shape == (1, 12, 20, 8)
