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
