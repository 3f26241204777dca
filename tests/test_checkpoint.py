"""Checkpoint tests: orbax save/restore round-trip + torch→flax trunk
conversion parity (flax ResNet-50 with converted weights must match a
torch ResNet-50 forward on the same input)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn as tnn

from airpose_tpu.models.resnet import ResNet50
from airpose_tpu.train.checkpoint import (
    CheckpointManager,
    convert_reference_checkpoint,
    convert_resnet_torch_to_flax,
)


class TorchBottleneck(tnn.Module):
    """Canonical torchvision bottleneck (public standard architecture)."""

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = tnn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, stride=stride, padding=1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes * 4)
        self.relu = tnn.ReLU()
        self.downsample = downsample

    def forward(self, x):
        r = x if self.downsample is None else self.downsample(x)
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return self.relu(y + r)


class TorchResNet50Trunk(tnn.Module):
    def __init__(self):
        super().__init__()
        self.inplanes = 64
        self.conv1 = tnn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.relu = tnn.ReLU()
        self.maxpool = tnn.MaxPool2d(3, stride=2, padding=1)
        self.layer1 = self._make(64, 3, 1)
        self.layer2 = self._make(128, 4, 2)
        self.layer3 = self._make(256, 6, 2)
        self.layer4 = self._make(512, 3, 2)

    def _make(self, planes, blocks, stride):
        down = tnn.Sequential(
            tnn.Conv2d(self.inplanes, planes * 4, 1, stride=stride, bias=False),
            tnn.BatchNorm2d(planes * 4),
        )
        layers = [TorchBottleneck(self.inplanes, planes, stride, down)]
        self.inplanes = planes * 4
        layers += [TorchBottleneck(self.inplanes, planes) for _ in range(1, blocks)]
        return tnn.Sequential(*layers)

    def forward(self, x):
        x = self.relu(self.bn1(self.conv1(x)))
        x = self.maxpool(x)
        x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
        return x.mean(dim=(2, 3))


@pytest.mark.slow
def test_trunk_conversion_parity(rng):
    torch.manual_seed(0)
    tmodel = TorchResNet50Trunk().eval()
    # randomize BN stats so the test is not trivially identity
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.8, 1.2)

    sd = tmodel.state_dict()
    converted = convert_resnet_torch_to_flax(sd)

    x = rng.normal(size=(2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()

    model = ResNet50()
    got = model.apply(
        {"params": converted["params"], "batch_stats": converted["batch_stats"]},
        jnp.asarray(x),
        train=False,
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-3, rtol=1e-3)


def test_full_checkpoint_conversion_structure():
    """Converted reference-style state dict must init-compatible with the
    twoview model's variable tree."""
    torch.manual_seed(1)
    tmodel = TorchResNet50Trunk()
    sd = {"model." + k: v for k, v in tmodel.state_dict().items()}
    # add the regressor heads the twoview checkpoint carries
    sd["model.fc1.weight"] = torch.randn(1024, 2332)
    sd["model.fc1.bias"] = torch.randn(1024)
    sd["model.fc2.weight"] = torch.randn(1024, 1024)
    sd["model.fc2.bias"] = torch.randn(1024)
    sd["model.decpose.weight"] = torch.randn(135, 1024)
    sd["model.decpose.bias"] = torch.randn(135)
    sd["model.decshape.weight"] = torch.randn(10, 1024)
    sd["model.decshape.bias"] = torch.randn(10)

    variables = convert_reference_checkpoint(sd, "copenet_twoview")

    from airpose_tpu.models import AirPoseTwoView

    model = AirPoseTwoView()
    x = jnp.zeros((1, 2, 224, 224, 3))
    ref = model.init(jax.random.PRNGKey(0), x, jnp.zeros((1, 2, 3)), jnp.zeros((1, 2, 3)))

    def shapes(tree):
        return jax.tree.map(lambda a: jnp.asarray(a).shape, tree)

    assert shapes(ref["params"]) == shapes(variables["params"])
    out = model.apply(
        {"params": variables["params"],
         "batch_stats": {**ref["batch_stats"], **jax.tree.map(jnp.asarray, variables["batch_stats"])}},
        x, jnp.zeros((1, 2, 3)), jnp.zeros((1, 2, 3)),
    )
    assert np.isfinite(np.asarray(out.pose)).all()


def test_orbax_roundtrip(tmp_path):
    from airpose_tpu.train.state import TrainState

    state = TrainState(
        step=7,
        params={"w": jnp.arange(6.0).reshape(2, 3)},
        batch_stats={"m": jnp.ones((4,))},
        opt_state={"v": jnp.zeros((2,))},
    )
    mgr = CheckpointManager(str(tmp_path / "ckpts"))
    mgr.save_with_val(state, val_loss=1.0)
    worse = state.replace(step=8, params={"w": jnp.zeros((2, 3))})
    mgr.save_with_val(worse, val_loss=2.0)

    template = jax.tree.map(jnp.zeros_like, state)
    last = mgr.restore(template, "last")
    best = mgr.restore(template, "best")
    assert int(last.step) == 8
    assert int(best.step) == 7
    np.testing.assert_array_equal(np.asarray(best.params["w"]), np.arange(6.0).reshape(2, 3))

    resumed = mgr.auto_resume(template)
    assert int(resumed.step) == 8


def test_auto_resume_fresh_when_no_checkpoint(tmp_path):
    from airpose_tpu.train.state import TrainState

    state = TrainState(step=0, params={"w": jnp.ones(2)}, batch_stats={}, opt_state={})
    mgr = CheckpointManager(str(tmp_path / "empty"))
    out = mgr.auto_resume(state)
    assert int(out.step) == 0


@pytest.mark.slow
def test_full_twoview_conversion_parity(rng):
    """Converted reference-style checkpoint: the flax AirPoseTwoView forward
    must match an independent torch emulation of the reference's
    feat_ext + 3x forward_reg IEF loop (eval mode) end to end."""
    import jax
    from airpose_tpu.models import AirPoseTwoView
    from airpose_tpu.models.regressor import load_mean_params

    torch.manual_seed(2)
    trunk = TorchResNet50Trunk().eval()
    with torch.no_grad():
        for m in trunk.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.normal_(0, 0.02)
                m.running_var.uniform_(0.9, 1.1)

    fc1 = tnn.Linear(2332, 1024)
    fc2 = tnn.Linear(1024, 1024)
    decpose = tnn.Linear(1024, 135)
    decshape = tnn.Linear(1024, 10)
    with torch.no_grad():
        for lin in (decpose, decshape):
            lin.weight.mul_(0.01)

    sd = {"model." + k: v for k, v in trunk.state_dict().items()}
    for name, mod in (("fc1", fc1), ("fc2", fc2),
                      ("decpose", decpose), ("decshape", decshape)):
        sd[f"model.{name}.weight"] = mod.weight.data
        sd[f"model.{name}.bias"] = mod.bias.data

    variables = convert_reference_checkpoint(sd, "copenet_twoview")

    B = 2
    x = rng.normal(size=(B, 2, 64, 64, 3)).astype(np.float32) * 0.2
    bb = rng.normal(size=(B, 2, 3)).astype(np.float32) * 0.1
    pos = np.full((B, 2, 3), 0.5, np.float32)

    # --- torch emulation of the reference IEF loop (eval: no dropout) ---
    mean_pose, mean_shape, _ = load_mean_params()
    with torch.no_grad():
        xf = [trunk(torch.from_numpy(x[:, v].transpose(0, 3, 1, 2)))
              for v in (0, 1)]
        pose = [torch.from_numpy(
            np.concatenate([pos[:, v], np.tile(mean_pose[:132], (B, 1))], 1))
            for v in (0, 1)]
        shape = [torch.from_numpy(np.tile(mean_shape, (B, 1))) for _ in (0, 1)]
        bb_t = [torch.from_numpy(bb[:, v]) for v in (0, 1)]
        for _ in range(3):
            new_pose, new_shape = [], []
            for v in (0, 1):
                o = 1 - v
                xc = torch.cat([
                    xf[v], bb_t[v], pose[v][:, :3], pose[v][:, 3:9],
                    pose[v][:, 9:], shape[v], pose[o][:, 9:], shape[o],
                ], 1)
                h = fc2(fc1(xc))
                new_pose.append(pose[v] + decpose(h))
                new_shape.append(shape[v] + decshape(h))
            pose, shape = new_pose, new_shape
    want_pose = np.stack([p.numpy() for p in pose], 1)
    want_shape = np.stack([s.numpy() for s in shape], 1)

    # --- flax forward with converted weights ---
    model = AirPoseTwoView()
    init_vars = model.init(
        jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(bb), jnp.asarray(pos)
    )
    merged = {
        "params": variables["params"],
        "batch_stats": {**init_vars["batch_stats"],
                        **jax.tree.map(jnp.asarray, variables["batch_stats"])},
    }
    out = model.apply(merged, jnp.asarray(x), jnp.asarray(bb), jnp.asarray(pos))
    np.testing.assert_allclose(np.asarray(out.pose), want_pose, atol=5e-3)
    np.testing.assert_allclose(np.asarray(out.betas), want_shape, atol=5e-3)


def _regressor_sd(prefix, rng_seed):
    torch.manual_seed(rng_seed)
    sd = {}
    for name, (o, i) in (("fc1", (1024, 2332)), ("fc2", (1024, 1024)),
                         ("decpose", (135, 1024)), ("decshape", (10, 1024))):
        sd[f"{prefix}{name}.weight"] = torch.randn(o, i) * 0.02
        sd[f"{prefix}{name}.bias"] = torch.randn(o) * 0.02
    return sd


def test_sep_checkpoint_conversion_matches_shared_twoview(rng):
    """A _sep checkpoint with copenet0 == copenet1 must produce the same
    forward as the shared-weight twoview model with those weights — the
    strongest structural check on the 'model.copenet{0,1}.' prefix mapping
    (ref model_copenet_sep.py:169-237)."""
    from airpose_tpu.models import AirPoseTwoView, AirPoseTwoViewSep

    torch.manual_seed(3)
    trunk = TorchResNet50Trunk()
    base = dict(trunk.state_dict())
    base.update(_regressor_sd("", 4))

    shared_sd = {"model." + k: v for k, v in base.items()}
    sep_sd = {}
    for v in (0, 1):
        sep_sd.update({f"model.copenet{v}." + k: t for k, t in base.items()})

    shared_vars = convert_reference_checkpoint(shared_sd, "copenet_twoview")
    sep_vars = convert_reference_checkpoint(sep_sd, "copenet_twoview_sep")

    B = 1
    x = jnp.asarray(rng.normal(size=(B, 2, 64, 64, 3)).astype(np.float32) * 0.2)
    bb = jnp.zeros((B, 2, 3))
    pos = jnp.full((B, 2, 3), 0.5)

    def run(model, variables):
        init = model.init(jax.random.PRNGKey(0), x, bb, pos)
        merged = {
            "params": variables["params"],
            "batch_stats": {**init["batch_stats"],
                            **jax.tree.map(jnp.asarray, variables["batch_stats"])},
        }
        return model.apply(merged, x, bb, pos)

    out_shared = run(AirPoseTwoView(), shared_vars)
    out_sep = run(AirPoseTwoViewSep(), sep_vars)
    np.testing.assert_allclose(
        np.asarray(out_sep.pose), np.asarray(out_shared.pose), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out_sep.betas), np.asarray(out_shared.betas), atol=1e-4
    )


def test_ckpt_cli_roundtrip(tmp_path):
    """The .ckpt→orbax CLI path: fabricated Lightning checkpoint file →
    converted orbax TrainState restorable by the eval entry points."""
    import orbax.checkpoint as ocp

    from airpose_tpu.models import AirPoseTwoView, family_init_args
    from airpose_tpu.train.checkpoint import convert_ckpt_file_to_orbax
    from airpose_tpu.train.state import create_train_state

    torch.manual_seed(5)
    trunk = TorchResNet50Trunk()
    sd = {"model." + k: v for k, v in trunk.state_dict().items()}
    sd.update({"model." + k: v for k, v in _regressor_sd("", 6).items()})
    ckpt_file = tmp_path / "epoch=257.ckpt"
    torch.save({"state_dict": sd, "hyper_parameters": {}}, ckpt_file)

    out = convert_ckpt_file_to_orbax(
        str(ckpt_file), "copenet_twoview", str(tmp_path / "orbax")
    )

    template, _ = create_train_state(
        AirPoseTwoView(), family_init_args("copenet_twoview", 1, 64),
        jax.random.PRNGKey(0), lr=5e-5,
    )
    restored = ocp.StandardCheckpointer().restore(out, template)
    np.testing.assert_allclose(
        np.asarray(restored.params["core"]["fc1"]["kernel"]),
        sd["model.fc1.weight"].numpy().T,
        atol=1e-6,
    )
    assert int(restored.step) == 0


def test_best_val_persists_across_manager_restarts(tmp_path):
    from airpose_tpu.train.state import TrainState

    state = TrainState(step=1, params={"w": jnp.ones(2)}, batch_stats={},
                       opt_state={})
    d = str(tmp_path / "ck")
    m1 = CheckpointManager(d)
    m1.save_with_val(state, val_loss=0.8)

    # simulate preemption restart: fresh manager, first val is worse
    m2 = CheckpointManager(d)
    assert m2.best_val == 0.8
    worse = state.replace(step=2, params={"w": jnp.zeros(2)})
    m2.save_with_val(worse, val_loss=1.5)
    best = m2.restore(jax.tree.map(jnp.zeros_like, state), "best")
    np.testing.assert_array_equal(np.asarray(best.params["w"]), np.ones(2))


def test_load_model_variables_both_sources(tmp_path):
    """The serving CLIs' shared loader: (a) a reference Lightning .ckpt
    file converts in-memory to the same weights the file converter writes,
    and (b) an orbax TrainState written with the `train_reg_only`
    multi_transform optimizer restores template-free (the opt_state
    variant the round-2 `--ckpt` path could not handle)."""
    from airpose_tpu.models import family_init_args
    from airpose_tpu.train.checkpoint import load_model_variables
    from airpose_tpu.train.state import create_train_state

    torch.manual_seed(7)
    trunk = TorchResNet50Trunk()
    sd = {"model." + k: v for k, v in trunk.state_dict().items()}
    sd.update({"model." + k: v for k, v in _regressor_sd("", 8).items()})
    ckpt_file = tmp_path / "final.ckpt"
    torch.save({"state_dict": sd, "hyper_parameters": {}}, ckpt_file)

    model, variables = load_model_variables(
        "copenet_twoview", torch_ckpt=str(ckpt_file))
    np.testing.assert_allclose(
        np.asarray(variables["params"]["core"]["fc1"]["kernel"]),
        sd["model.fc1.weight"].numpy().T, atol=1e-6)
    assert "trunk" in variables["batch_stats"]

    from airpose_tpu.models import MODEL_REGISTRY

    state, _ = create_train_state(
        MODEL_REGISTRY["copenet_twoview"](),
        family_init_args("copenet_twoview", 1, 64),
        jax.random.PRNGKey(3), lr=5e-5, train_reg_only=True,
    )
    mgr = CheckpointManager(str(tmp_path / "orbax"))
    mgr.save(state, "last")
    _, restored = load_model_variables(
        "copenet_twoview", ckpt=str(tmp_path / "orbax" / "last"))
    np.testing.assert_allclose(
        np.asarray(restored["params"]["core"]["fc1"]["kernel"]),
        np.asarray(state.params["core"]["fc1"]["kernel"]), atol=0)

    with pytest.raises(ValueError):
        load_model_variables("copenet_twoview")


@pytest.mark.parametrize("family", ["copenet_twoview", "copenet_twoview_sep",
                                    "hmr"])
def test_export_then_convert_roundtrips(tmp_path, family):
    """export_reference_checkpoint → convert_reference_checkpoint must
    reproduce the original flax variables exactly (the converter-pair
    proof the dress rehearsal runs on genuinely trained weights)."""
    from airpose_tpu.models import MODEL_REGISTRY, family_init_args
    from airpose_tpu.train.checkpoint import (
        convert_reference_checkpoint,
        export_reference_checkpoint,
    )

    model = MODEL_REGISTRY[family]()
    variables = model.init(
        jax.random.PRNGKey(11), *family_init_args(family, 1, 64))
    path = str(tmp_path / "exported.ckpt")
    export_reference_checkpoint(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]}, family, path)

    blob = torch.load(path, map_location="cpu", weights_only=False)
    back = convert_reference_checkpoint(blob["state_dict"], family)

    for tree_name in ("params", "batch_stats"):
        orig = jax.tree.leaves_with_path(dict(variables[tree_name]))
        conv = dict(jax.tree_util.tree_flatten_with_path(back[tree_name])[0])
        orig_map = {jax.tree_util.keystr(p): np.asarray(a) for p, a in orig}
        conv_map = {jax.tree_util.keystr(p): np.asarray(a) for p, a in conv.items()}
        if family == "hmr":
            # export writes deccam; the flax hmr has it too — full match
            pass
        assert set(conv_map) == set(orig_map), (
            set(conv_map) ^ set(orig_map))
        for k in orig_map:
            np.testing.assert_allclose(conv_map[k], orig_map[k], atol=1e-6,
                                       err_msg=k)


def test_imagenet_trunk_warm_start(tmp_path):
    """`--imagenet_ckpt`: a raw torchvision ResNet-50 state dict warm-starts
    the trunk(s) — shared families get `trunk`, the _sep family both
    per-drone copies (ref model_copenet.py:236-238 non-strict ImageNet
    load at construction)."""
    from airpose_tpu.models import MODEL_REGISTRY, family_init_args
    from airpose_tpu.train.checkpoint import (
        load_imagenet_resnet50,
        warm_start_trunks,
    )

    torch.manual_seed(3)
    tmodel = TorchResNet50Trunk()
    sd = dict(tmodel.state_dict())
    # torchvision files carry the classifier head; the warm start ignores it
    sd["fc.weight"] = torch.randn(1000, 2048)
    sd["fc.bias"] = torch.randn(1000)
    path = str(tmp_path / "resnet50-imagenet.pth")
    torch.save(sd, path)

    trunk = load_imagenet_resnet50(path)
    want_conv1 = sd["conv1.weight"].numpy().transpose(2, 3, 1, 0)
    np.testing.assert_allclose(
        np.asarray(trunk["params"]["conv1"]["kernel"]), want_conv1)

    for family, keys in (
        ("copenet_twoview", ("trunk",)),
        ("copenet_twoview_sep", ("trunk0", "trunk1")),
    ):
        model = MODEL_REGISTRY[family]()
        variables = model.init(
            jax.random.PRNGKey(5), *family_init_args(family, 1, 64))
        p, bs = warm_start_trunks(
            dict(variables["params"]), dict(variables["batch_stats"]),
            trunk, family)
        for k in keys:
            np.testing.assert_allclose(
                np.asarray(p[k]["conv1"]["kernel"]), want_conv1, atol=1e-6)
            np.testing.assert_allclose(
                np.asarray(bs[k]["bn1"]["mean"]),
                sd["bn1.running_mean"].numpy(), atol=1e-6)
        # the regressor core is untouched
        core_key = "core" if family == "copenet_twoview" else "core0"
        before = jax.tree.leaves(variables["params"][core_key])
        after = jax.tree.leaves(p[core_key])
        for a, b in zip(before, after):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
