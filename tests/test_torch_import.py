"""torchvision-format ResNet ingestion vs a torch-computed oracle.

Builds a synthetic state_dict in torchvision's naming (no torchvision
needed), runs a minimal torch implementation of ResNet-v1.5 inference on
it, and asserts our imported-and-folded forward matches — cross-FRAMEWORK
parity on identical weights, complementing the cross-engine (C++) parity
harness.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from qcnn_tpu.models import resnet
from qcnn_tpu.models.torch_import import (
    load_torch_resnet, resnet_from_torch_state_dict,
)


def _mk_state_dict(spec, rng):
    """Random torchvision-naming state_dict for `spec` (values scaled so
    activations stay finite through the depth)."""
    sd = {}

    def add_conv(name, cout, cin, k):
        w = rng.standard_normal((cout, cin, k, k)) / np.sqrt(cin * k * k)
        sd[f"{name}.weight"] = torch.tensor(w, dtype=torch.float32)

    def add_bn(name, c):
        sd[f"{name}.weight"] = torch.tensor(
            1.0 + 0.1 * rng.standard_normal(c), dtype=torch.float32)
        sd[f"{name}.bias"] = torch.tensor(
            0.05 * rng.standard_normal(c), dtype=torch.float32)
        sd[f"{name}.running_mean"] = torch.tensor(
            0.05 * rng.standard_normal(c), dtype=torch.float32)
        sd[f"{name}.running_var"] = torch.tensor(
            0.5 + rng.random(c), dtype=torch.float32)

    add_conv("conv1", 64, 3, 7)
    add_bn("bn1", 64)
    cin = 64
    for s, depth in enumerate(spec.stage_depths):
        mid, cout = resnet._block_channels(spec, s)
        for b in range(depth):
            p = f"layer{s + 1}.{b}"
            stride = 2 if (s > 0 and b == 0) else 1
            if spec.bottleneck:
                add_conv(f"{p}.conv1", mid, cin, 1)
                add_bn(f"{p}.bn1", mid)
                add_conv(f"{p}.conv2", mid, mid, 3)
                add_bn(f"{p}.bn2", mid)
                add_conv(f"{p}.conv3", cout, mid, 1)
                add_bn(f"{p}.bn3", cout)
            else:
                add_conv(f"{p}.conv1", mid, cin, 3)
                add_bn(f"{p}.bn1", mid)
                add_conv(f"{p}.conv2", cout, mid, 3)
                add_bn(f"{p}.bn2", cout)
            if stride != 1 or cin != cout:
                add_conv(f"{p}.downsample.0", cout, cin, 1)
                add_bn(f"{p}.downsample.1", cout)
            cin = cout
    w = rng.standard_normal((spec.num_classes, cin)) / np.sqrt(cin)
    sd["fc.weight"] = torch.tensor(w, dtype=torch.float32)
    sd["fc.bias"] = torch.tensor(
        0.05 * rng.standard_normal(spec.num_classes), dtype=torch.float32)
    return sd


def _torch_forward(spec, sd, x_nchw):
    """Minimal torchvision-semantics ResNet-v1.5 inference in torch."""
    import torch.nn.functional as F

    def bn(name, y):
        return F.batch_norm(
            y, sd[f"{name}.running_mean"], sd[f"{name}.running_var"],
            sd[f"{name}.weight"], sd[f"{name}.bias"], training=False,
        )

    with torch.no_grad():
        y = F.conv2d(x_nchw, sd["conv1.weight"], stride=2, padding=3)
        y = F.relu(bn("bn1", y))
        y = F.max_pool2d(y, 3, stride=2, padding=1)  # floor mode
        for s, depth in enumerate(spec.stage_depths):
            for b in range(depth):
                p = f"layer{s + 1}.{b}"
                stride = 2 if (s > 0 and b == 0) else 1
                identity = y
                if f"{p}.downsample.0.weight" in sd:
                    identity = bn(f"{p}.downsample.1", F.conv2d(
                        y, sd[f"{p}.downsample.0.weight"], stride=stride))
                if spec.bottleneck:
                    z = F.relu(bn(f"{p}.bn1", F.conv2d(
                        y, sd[f"{p}.conv1.weight"])))
                    z = F.relu(bn(f"{p}.bn2", F.conv2d(
                        z, sd[f"{p}.conv2.weight"], stride=stride,
                        padding=1)))
                    z = bn(f"{p}.bn3", F.conv2d(z, sd[f"{p}.conv3.weight"]))
                else:
                    z = F.relu(bn(f"{p}.bn1", F.conv2d(
                        y, sd[f"{p}.conv1.weight"], stride=stride,
                        padding=1)))
                    z = bn(f"{p}.bn2", F.conv2d(
                        z, sd[f"{p}.conv2.weight"], padding=1))
                y = F.relu(z + identity)
        y = y.mean(dim=(2, 3))
        return (y @ sd["fc.weight"].t() + sd["fc.bias"]).numpy()


@pytest.mark.parametrize("model", ["resnet18", "resnet50"])
def test_torch_state_dict_parity(model):
    spec = resnet.RESNETS[model]()
    rng = np.random.default_rng(3)
    sd = _mk_state_dict(spec, rng)
    x = rng.standard_normal((2, 224, 224, 3)).astype(np.float32)

    want = _torch_forward(spec, sd, torch.tensor(
        np.transpose(x, (0, 3, 1, 2)), dtype=torch.float32))
    params = resnet_from_torch_state_dict(spec, sd)
    got = np.asarray(resnet.forward(params, x, spec=spec))

    assert np.all(np.isfinite(want)) and np.abs(want).max() > 1e-3
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)
    np.testing.assert_array_equal(got.argmax(-1), want.argmax(-1))


def _mk_vit_state_dict(spec, rng):
    """Random timm-naming ViT state_dict."""
    d = spec.dim
    sd = {}

    def t(a):
        return torch.tensor(np.asarray(a, np.float32))

    def gemm(name, cin, cout):
        sd[f"{name}.weight"] = t(rng.standard_normal((cout, cin))
                                 / np.sqrt(cin))
        sd[f"{name}.bias"] = t(0.02 * rng.standard_normal(cout))

    def ln(name, c):
        sd[f"{name}.weight"] = t(1.0 + 0.05 * rng.standard_normal(c))
        sd[f"{name}.bias"] = t(0.02 * rng.standard_normal(c))

    p = spec.patch
    sd["patch_embed.proj.weight"] = t(
        rng.standard_normal((d, 3, p, p)) / np.sqrt(3 * p * p))
    sd["patch_embed.proj.bias"] = t(0.02 * rng.standard_normal(d))
    sd["cls_token"] = t(0.02 * rng.standard_normal((1, 1, d)))
    sd["pos_embed"] = t(0.02 * rng.standard_normal((1, spec.seq_len, d)))
    for i in range(spec.depth):
        b = f"blocks.{i}"
        ln(f"{b}.norm1", d)
        gemm(f"{b}.attn.qkv", d, 3 * d)
        gemm(f"{b}.attn.proj", d, d)
        ln(f"{b}.norm2", d)
        gemm(f"{b}.mlp.fc1", d, spec.mlp_ratio * d)
        gemm(f"{b}.mlp.fc2", spec.mlp_ratio * d, d)
    ln("norm", d)
    gemm("head", d, spec.num_classes)
    return sd


def _torch_vit_forward(spec, sd, x_nchw):
    """Minimal timm-semantics ViT inference in torch."""
    import torch.nn.functional as F

    d, nh = spec.dim, spec.heads
    hd = d // nh

    def ln(name, y):
        return F.layer_norm(y, (d,), sd[f"{name}.weight"],
                            sd[f"{name}.bias"], eps=1e-6)

    def gemm(name, y):
        return y @ sd[f"{name}.weight"].t() + sd[f"{name}.bias"]

    with torch.no_grad():
        y = F.conv2d(x_nchw, sd["patch_embed.proj.weight"],
                     sd["patch_embed.proj.bias"], stride=spec.patch)
        b = y.shape[0]
        y = y.flatten(2).transpose(1, 2)  # (B, N, D)
        cls = sd["cls_token"].expand(b, -1, -1)
        y = torch.cat([cls, y], dim=1) + sd["pos_embed"]
        for i in range(spec.depth):
            blk = f"blocks.{i}"
            z = ln(f"{blk}.norm1", y)
            qkv = gemm(f"{blk}.attn.qkv", z)
            qkv = qkv.reshape(b, -1, 3, nh, hd).permute(2, 0, 3, 1, 4)
            q, k, v = qkv[0], qkv[1], qkv[2]  # (B, nh, N, hd)
            att = (q @ k.transpose(-2, -1)) / np.sqrt(hd)
            att = att.softmax(dim=-1)
            z = (att @ v).transpose(1, 2).reshape(b, -1, d)
            y = y + gemm(f"{blk}.attn.proj", z)
            z = ln(f"{blk}.norm2", y)
            z = F.gelu(gemm(f"{blk}.mlp.fc1", z))
            y = y + gemm(f"{blk}.mlp.fc2", z)
        y = ln("norm", y)
        return gemm("head", y[:, 0]).numpy()


def test_vit_timm_state_dict_parity():
    from qcnn_tpu.models import vit
    from qcnn_tpu.models.torch_import import vit_from_torch_state_dict

    spec = vit.VITS["vit_s16"]()
    rng = np.random.default_rng(7)
    sd = _mk_vit_state_dict(spec, rng)
    x = rng.standard_normal((2, spec.image_size, spec.image_size, 3)
                            ).astype(np.float32)
    want = _torch_vit_forward(spec, sd, torch.tensor(
        np.transpose(x, (0, 3, 1, 2)), dtype=torch.float32))
    params = vit_from_torch_state_dict(spec, sd)
    got = np.asarray(vit.forward(params, x, spec=spec))
    assert np.all(np.isfinite(want)) and np.abs(want).max() > 1e-3
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-3)
    np.testing.assert_array_equal(got.argmax(-1), want.argmax(-1))


def test_make_family_from_torch_cli(tmp_path):
    """End-to-end: torch .pt -> make-family --from-torch -> loadable
    family checkpoint."""
    from qcnn_tpu.cli import main
    from qcnn_tpu.formats.checkpoint import load_family_checkpoint

    spec = resnet.RESNETS["resnet18"]()
    sd = _mk_state_dict(spec, np.random.default_rng(5))
    pt = str(tmp_path / "weights.pth")
    torch.save(sd, pt)
    out = str(tmp_path / "ckpt")
    assert main([
        "make-family", "resnet18", out,
        "--from-torch", pt, "--dense", "--cpu",
    ]) == 0
    family, spec2, params = load_family_checkpoint(out)
    assert family == "resnet"
    x = np.random.default_rng(6).standard_normal(
        (1, 224, 224, 3)).astype(np.float32)
    out_logits = np.asarray(resnet.forward(params, x, spec=spec2))
    want = _torch_forward(spec, sd, torch.tensor(
        np.transpose(x, (0, 3, 1, 2)), dtype=torch.float32))
    np.testing.assert_allclose(out_logits, want, rtol=1e-3, atol=1e-3)


def test_make_family_from_torch_vit_cli(tmp_path):
    from qcnn_tpu.cli import main
    from qcnn_tpu.formats.checkpoint import load_family_checkpoint
    from qcnn_tpu.models import vit

    spec = vit.VITS["vit_s16"]()
    sd = _mk_vit_state_dict(spec, np.random.default_rng(8))
    pt = str(tmp_path / "vit.pth")
    torch.save(sd, pt)
    out = str(tmp_path / "vitckpt")
    assert main([
        "make-family", "vit_s16", out, "--from-torch", pt, "--dense",
        "--cpu",
    ]) == 0
    family, spec2, params = load_family_checkpoint(out)
    assert family == "vit"
    x = np.random.default_rng(9).standard_normal(
        (1, spec.image_size, spec.image_size, 3)).astype(np.float32)
    got = np.asarray(vit.forward(params, x, spec=spec2))
    want = _torch_vit_forward(spec, sd, torch.tensor(
        np.transpose(x, (0, 3, 1, 2)), dtype=torch.float32))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-3)


def test_load_torch_resnet_file(tmp_path):
    spec = resnet.RESNETS["resnet18"]()
    rng = np.random.default_rng(4)
    sd = _mk_state_dict(spec, rng)
    path = str(tmp_path / "ckpt.pt")
    torch.save({"state_dict": sd}, path)
    params = load_torch_resnet(spec, path)
    x = rng.standard_normal((1, 224, 224, 3)).astype(np.float32)
    out = np.asarray(resnet.forward(params, x, spec=spec))
    assert out.shape == (1, spec.num_classes)
    direct = resnet_from_torch_state_dict(spec, sd)
    np.testing.assert_array_equal(
        params["stem"]["kernel"], direct["stem"]["kernel"]
    )


# ---------------------------------------------------------------------------
# linear zoo: torchvision sequential-CNN (features./classifier.) ingestion
# ---------------------------------------------------------------------------

def _mini_vgg_spec():
    """Tiny VGG-shaped linear spec for torch-oracle parity (the mapping is
    order-driven, so this exercises exactly the vgg16 code path)."""
    from qcnn_tpu.core import (
        ConvSpec, DropoutSpec, FCSpec, ModelSpec, PoolSpec, ReLUSpec,
        SoftmaxSpec,
    )

    return ModelSpec(
        name="MiniVGG", in_height=16, in_width=16, in_channels=3,
        layers=(
            ConvSpec(kernel=3, out_channels=8, pad=1), ReLUSpec(),
            PoolSpec(kernel=2, stride=2),
            ConvSpec(kernel=3, out_channels=16, pad=1), ReLUSpec(),
            PoolSpec(kernel=2, stride=2),
            FCSpec(32), ReLUSpec(), DropoutSpec(0.5),
            FCSpec(10), SoftmaxSpec(),
        ),
    )


def _mk_linear_state_dict(rng):
    """torchvision vgg-style naming for _mini_vgg_spec (gaps in the indices
    where ReLU/pool/dropout modules would sit, like the real vgg16)."""
    sd = {}

    def conv(i, cin, cout):
        sd[f"features.{i}.weight"] = torch.tensor(
            rng.standard_normal((cout, cin, 3, 3)) / np.sqrt(cin * 9),
            dtype=torch.float32)
        sd[f"features.{i}.bias"] = torch.tensor(
            0.02 * rng.standard_normal(cout), dtype=torch.float32)

    def fc(i, cin, cout):
        sd[f"classifier.{i}.weight"] = torch.tensor(
            rng.standard_normal((cout, cin)) / np.sqrt(cin),
            dtype=torch.float32)
        sd[f"classifier.{i}.bias"] = torch.tensor(
            0.02 * rng.standard_normal(cout), dtype=torch.float32)

    conv(0, 3, 8)
    conv(3, 8, 16)
    fc(0, 16 * 4 * 4, 32)
    fc(3, 32, 10)
    return sd


def test_linear_torch_state_dict_parity():
    """Imported mini-VGG forward matches a torch-computed oracle —
    validates conv OIHW->HWIO and the NCHW first-FC flatten mapping
    (torch flattens (C,H,W) like Caffe, CaffeEva.cc:184-204)."""
    import torch.nn.functional as F

    from qcnn_tpu.models.network import forward
    from qcnn_tpu.models.torch_import import linear_from_torch_state_dict

    spec = _mini_vgg_spec()
    rng = np.random.default_rng(11)
    sd = _mk_linear_state_dict(rng)
    params = linear_from_torch_state_dict(spec, sd)

    x = rng.standard_normal((2, 16, 16, 3)).astype(np.float32)
    got = np.asarray(forward(params, x, spec=spec))

    with torch.no_grad():
        t = torch.tensor(np.transpose(x, (0, 3, 1, 2)))
        t = F.max_pool2d(F.relu(F.conv2d(
            t, sd["features.0.weight"], sd["features.0.bias"],
            padding=1)), 2)
        t = F.max_pool2d(F.relu(F.conv2d(
            t, sd["features.3.weight"], sd["features.3.bias"],
            padding=1)), 2)
        t = t.flatten(1)  # NCHW flatten, matching Caffe semantics
        t = F.relu(t @ sd["classifier.0.weight"].t()
                   + sd["classifier.0.bias"])
        t = t @ sd["classifier.3.weight"].t() + sd["classifier.3.bias"]
        want = F.softmax(t, dim=-1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(got.argmax(-1), want.argmax(-1))


def test_vgg16_torch_shape_mapping():
    """Full torchvision vgg16 key layout (indices 0..28 / 0,3,6) maps onto
    the zoo vgg16 spec with correct per-layer shapes."""
    from qcnn_tpu.core import ConvSpec, FCSpec
    from qcnn_tpu.models import zoo
    from qcnn_tpu.models.torch_import import linear_from_torch_state_dict

    spec = zoo.get_model("vgg16")
    conv_idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    chans = [(3, 64), (64, 64), (64, 128), (128, 128), (128, 256),
             (256, 256), (256, 256), (256, 512), (512, 512), (512, 512),
             (512, 512), (512, 512), (512, 512)]
    sd = {}
    for i, (cin, cout) in zip(conv_idx, chans):
        sd[f"features.{i}.weight"] = np.zeros((cout, cin, 3, 3), np.float32)
        sd[f"features.{i}.bias"] = np.zeros(cout, np.float32)
    for i, (cin, cout) in zip([0, 3, 6],
                              [(25088, 4096), (4096, 4096), (4096, 1000)]):
        sd[f"classifier.{i}.weight"] = np.zeros((cout, cin), np.float32)
        sd[f"classifier.{i}.bias"] = np.zeros(cout, np.float32)
    params = linear_from_torch_state_dict(spec, sd)
    learnable = [
        (l, p) for l, p in zip(spec.layers, params) if p is not None
    ]
    assert len(learnable) == 16
    for l, p in learnable:
        if isinstance(l, ConvSpec):
            assert p["kernel"].shape[3] == l.out_channels
        else:
            assert isinstance(l, FCSpec)
            assert p["weight"].shape[1] == l.out_features


def test_quantize_cli_from_torch(tmp_path, monkeypatch):
    """quantize <sd.pth> out --arch <name>: torch state_dict -> PQ
    checkpoint with the torch eval transform embedded."""
    from qcnn_tpu.cli import main
    from qcnn_tpu.formats.checkpoint import load_checkpoint, load_preprocessor
    from qcnn_tpu.models import zoo
    from qcnn_tpu.preproc import TorchPreprocessor

    spec = _mini_vgg_spec()
    monkeypatch.setitem(zoo.MODELS, "minivgg", lambda: spec)
    sd = _mk_linear_state_dict(np.random.default_rng(12))
    pt = str(tmp_path / "mini.pth")
    torch.save(sd, pt)
    out = str(tmp_path / "pq")
    assert main([
        "quantize", pt, out, "--arch", "minivgg", "--cpu",
        "--conv-subvec-len", "4", "--conv-codewords", "8",
        "--fc-subvec-len", "4", "--fc-codewords", "8",
    ]) == 0
    spec2, params = load_checkpoint(out)
    assert spec2.name == "MiniVGG"
    assert any(p is not None and "codebooks" in p for p in params)
    pre = load_preprocessor(out)
    assert isinstance(pre, TorchPreprocessor)
    assert pre.crop == spec.in_height


def test_deeper_resnet_variants_map():
    """resnet101/152 specs exist and the torchvision naming maps without a
    forward (the per-block mapping is spec-driven)."""
    for name, blocks in [("resnet101", (3, 4, 23, 3)),
                         ("resnet152", (3, 8, 36, 3))]:
        spec = resnet.RESNETS[name]()
        assert spec.stage_depths == blocks
        sd = _mk_state_dict(spec, np.random.default_rng(5))
        params = resnet_from_torch_state_dict(spec, sd)
        for s, d in enumerate(blocks):
            for b in range(d):
                assert f"s{s}b{b}" in params
        assert len(params) == sum(blocks) + 2  # + stem + fc
