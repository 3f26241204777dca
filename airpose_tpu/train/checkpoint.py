"""Checkpointing: orbax save/restore with auto-resume, plus a converter
from the reference's PyTorch-Lightning checkpoints.

Replaces Lightning's ModelCheckpoint(val_loss, save_top_k=1, save_last=True)
+ resume-from-last (ref copenet/copenet_trainer.py:42-53) and the HTCondor
deadline checkpoint-exit-resume cycle (ref copenet_trainer_cluster.py:44-60
— see `train/elastic.py`).
"""

import json
import os
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from .state import TrainState


class CheckpointManager:
    """Thin orbax wrapper: keeps `best` (lowest val_loss) and `last`."""

    def __init__(self, directory: str):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._ckpt = ocp.StandardCheckpointer()
        # best_val survives preemption restarts so a resumed run cannot
        # overwrite `best` with a worse state
        self._meta_path = os.path.join(self.directory, "best_val.json")
        self.best_val = float("inf")
        if os.path.exists(self._meta_path):
            with open(self._meta_path) as f:
                self.best_val = float(json.load(f)["best_val"])

    def _path(self, name: str) -> str:
        return os.path.join(self.directory, name)

    def save(self, state: TrainState, name: str = "last"):
        path = self._path(name)
        self._ckpt.save(path, jax.device_get(state), force=True)
        self._ckpt.wait_until_finished()

    def save_with_val(self, state: TrainState, val_loss: float):
        self.save(state, "last")
        if val_loss < self.best_val:
            self.best_val = val_loss
            self.save(state, "best")
            with open(self._meta_path, "w") as f:
                json.dump({"best_val": self.best_val}, f)

    def restore(self, template: TrainState, name: str = "last") -> Optional[TrainState]:
        path = self._path(name)
        if not os.path.exists(path):
            return None
        return self._ckpt.restore(path, template)

    def auto_resume(self, template: TrainState) -> TrainState:
        """Resume from `last` if present, else return the fresh template —
        the reference's resume_from_checkpoint behavior
        (copenet_trainer.py:49-53)."""
        restored = self.restore(template, "last")
        return restored if restored is not None else template


# ---------------------------------------------------------------------------
# PyTorch → airpose_tpu weight conversion
# ---------------------------------------------------------------------------

def _np(t):
    return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)


def convert_resnet_torch_to_flax(sd: Dict[str, Any], prefix: str = "") -> Dict:
    """Map a torchvision-style ResNet-50 state dict (the reference trunk's
    layout, ref model_copenet.py:53-110) onto the flax trunk's param /
    batch_stats trees. ``prefix`` strips e.g. 'model.' from Lightning keys.

    Returns {"params": {...}, "batch_stats": {...}} for the ResNet50 module.
    """
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def conv(key):
        # torch OIHW → flax HWIO
        return _np(sd[prefix + key]).transpose(2, 3, 1, 0)

    def put_bn(dst_p, dst_s, key):
        dst_p["scale"] = _np(sd[prefix + key + ".weight"])
        dst_p["bias"] = _np(sd[prefix + key + ".bias"])
        dst_s["mean"] = _np(sd[prefix + key + ".running_mean"])
        dst_s["var"] = _np(sd[prefix + key + ".running_var"])

    params["conv1"] = {"kernel": conv("conv1.weight")}
    params["bn1"] = {}
    stats["bn1"] = {}
    put_bn(params["bn1"], stats["bn1"], "bn1")

    blocks_per_stage = (3, 4, 6, 3)
    for stage, n_blocks in enumerate(blocks_per_stage, start=1):
        for b in range(n_blocks):
            src = f"layer{stage}.{b}"
            dst = f"layer{stage}_{b}"
            p: Dict[str, Any] = {}
            s: Dict[str, Any] = {}
            for ci in (1, 2, 3):
                p[f"conv{ci}"] = {"kernel": conv(f"{src}.conv{ci}.weight")}
                p[f"bn{ci}"] = {}
                s[f"bn{ci}"] = {}
                put_bn(p[f"bn{ci}"], s[f"bn{ci}"], f"{src}.bn{ci}")
            if prefix + f"{src}.downsample.0.weight" in sd:
                # torch names: downsample.0 (conv), downsample.1 (bn)
                p["downsample_conv"] = {"kernel": conv(f"{src}.downsample.0.weight")}
                p["downsample_bn"] = {}
                s["downsample_bn"] = {}
                put_bn(p["downsample_bn"], s["downsample_bn"], f"{src}.downsample.1")
            params[dst] = p
            stats[dst] = s
    return {"params": params, "batch_stats": stats}


def convert_regressor_torch_to_flax(
    sd: Dict[str, Any], head_names, prefix: str = ""
) -> Dict:
    """fc1/fc2 + dec heads: torch Linear (out, in) → flax Dense (in, out)."""
    out: Dict[str, Any] = {}
    for name in ("fc1", "fc2") + tuple(head_names):
        out[name] = {
            "kernel": _np(sd[prefix + name + ".weight"]).T,
            "bias": _np(sd[prefix + name + ".bias"]),
        }
    return out


def convert_reference_checkpoint(
    torch_state_dict: Dict[str, Any],
    model_name: str = "copenet_twoview",
    lightning: bool = True,
) -> Dict:
    """Full conversion of a reference checkpoint's ``state_dict`` (Lightning
    keys 'model.<...>') into this framework's variables for the matching
    model family. The _sep family (per-drone weight copies) carries
    'model.copenet0./copenet1.' sub-prefixes, each holding a full
    trunk+regressor (ref copenet_real/models/model_copenet_sep.py:169-237,
    forward_reg routing through self.copenet{0,1}.fc1/fc2/dec*)."""
    prefix = "model." if lightning else ""
    if model_name == "copenet_twoview_sep":
        params: Dict[str, Any] = {}
        stats: Dict[str, Any] = {}
        for v in (0, 1):
            sub = f"{prefix}copenet{v}."
            trunk = convert_resnet_torch_to_flax(torch_state_dict, sub)
            core = convert_regressor_torch_to_flax(
                torch_state_dict, ("decpose", "decshape"), sub
            )
            params[f"trunk{v}"] = trunk["params"]
            params[f"core{v}"] = core
            stats[f"trunk{v}"] = trunk["batch_stats"]
        return {"params": params, "batch_stats": stats}

    head_names = {
        "hmr": ("decpose", "decshape", "deccam"),
        "muhmr": ("decpose", "decshape", "deccam"),
        "copenet_singleview": ("decpose", "decshape"),
        "copenet_twoview": ("decpose", "decshape"),
    }[model_name]
    # The reference singleview/twoview checkpoints still contain an unused
    # deccam head — ignored here.
    trunk = convert_resnet_torch_to_flax(torch_state_dict, prefix)
    core = convert_regressor_torch_to_flax(torch_state_dict, head_names, prefix)
    return {
        "params": {"trunk": trunk["params"], "core": core},
        "batch_stats": {"trunk": trunk["batch_stats"]},
    }


def load_imagenet_resnet50(path: str) -> Dict:
    """Torchvision ResNet-50 weight file → flax trunk trees.

    The reference loads torchvision's ImageNet ResNet-50 weights
    non-strictly at model construction (ref
    copenet/src/copenet/models/model_copenet.py:236-238); here the same
    warm start is explicit: point ``trainer --imagenet_ckpt`` at a saved
    ``resnet50-*.pth`` state dict (raw, or wrapped in ``{'state_dict':
    ...}``). The classifier ``fc.*`` entries are simply unused, matching
    the reference's strict=False load.
    """
    import torch  # host-side conversion only — not the compute path

    try:
        obj = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        obj = torch.load(path, map_location="cpu", weights_only=False)
    sd = obj.get("state_dict", obj) if isinstance(obj, dict) else obj
    # tolerate DataParallel-style 'module.' prefixes
    prefix = "module." if any(k.startswith("module.") for k in sd) else ""
    return convert_resnet_torch_to_flax(sd, prefix)


def warm_start_trunks(params: Dict, batch_stats: Dict, trunk: Dict,
                      model_name: str):
    """Merge converted trunk trees into a model's param/batch-stats trees.

    Shared-trunk families get ``trunk``; the per-drone
    ``copenet_twoview_sep`` gets the same ImageNet weights in BOTH
    ``trunk0`` and ``trunk1`` (the reference constructs copenet0/copenet1
    each with pretrained=True, ref model_copenet_sep.py:169-237). The
    tree-map onto the existing leaves preserves dtypes and asserts the
    structures match.
    """
    keys = (("trunk0", "trunk1") if model_name == "copenet_twoview_sep"
            else ("trunk",))
    params = dict(params)
    batch_stats = dict(batch_stats)
    for k in keys:
        params[k] = jax.tree.map(
            lambda old, new: np.asarray(new, dtype=old.dtype),
            params[k], trunk["params"])
        batch_stats[k] = jax.tree.map(
            lambda old, new: np.asarray(new, dtype=old.dtype),
            batch_stats[k], trunk["batch_stats"])
    return params, batch_stats


def _export_resnet_flax_to_torch(params: Dict, stats: Dict, sd: Dict,
                                 prefix: str) -> None:
    """Inverse of `convert_resnet_torch_to_flax`: flax trunk trees → torch
    state-dict entries (HWIO → OIHW)."""
    import torch

    def put_conv(key, kernel):
        sd[prefix + key] = torch.from_numpy(
            np.asarray(kernel, np.float32).transpose(3, 2, 0, 1).copy())

    def put_bn(key, p, s):
        # np.array (not asarray): always copy — jax exports can be
        # non-writable views, and torch.from_numpy warns/aliases on those.
        sd[prefix + key + ".weight"] = torch.from_numpy(np.array(p["scale"], np.float32))
        sd[prefix + key + ".bias"] = torch.from_numpy(np.array(p["bias"], np.float32))
        sd[prefix + key + ".running_mean"] = torch.from_numpy(np.array(s["mean"], np.float32))
        sd[prefix + key + ".running_var"] = torch.from_numpy(np.array(s["var"], np.float32))
        # torch BatchNorm2d tracks an update counter in the state dict; it
        # never enters an eval forward but a strict load_state_dict on the
        # reference net requires the key.
        sd[prefix + key + ".num_batches_tracked"] = torch.zeros((), dtype=torch.long)

    put_conv("conv1.weight", params["conv1"]["kernel"])
    put_bn("bn1", params["bn1"], stats["bn1"])
    for stage, n_blocks in enumerate((3, 4, 6, 3), start=1):
        for b in range(n_blocks):
            src = f"layer{stage}_{b}"
            dst = f"layer{stage}.{b}"
            for ci in (1, 2, 3):
                put_conv(f"{dst}.conv{ci}.weight", params[src][f"conv{ci}"]["kernel"])
                put_bn(f"{dst}.bn{ci}", params[src][f"bn{ci}"], stats[src][f"bn{ci}"])
            if "downsample_conv" in params[src]:
                put_conv(f"{dst}.downsample.0.weight",
                         params[src]["downsample_conv"]["kernel"])
                put_bn(f"{dst}.downsample.1", params[src]["downsample_bn"],
                       stats[src]["downsample_bn"])


def export_reference_checkpoint(variables: Dict, model_name: str,
                                out_path: str) -> str:
    """Inverse converter: this framework's variables → a reference-layout
    PyTorch-Lightning ``.ckpt`` (state_dict with 'model.' keys, torch
    Linear (out, in) / conv OIHW orientation — the exact layout
    `convert_reference_checkpoint` consumes, ref model_copenet.py:53-110 /
    model_copenet_sep.py:169-237). Two uses: serving TPU-trained weights
    through reference-side tooling, and the dress-rehearsal round-trip
    that proves the converter pair on genuinely trained weights."""
    import torch  # host-side conversion tool only

    params = variables["params"]
    stats = variables["batch_stats"]
    sd: Dict[str, Any] = {}

    def put_linear(prefix, name, tree):
        sd[f"{prefix}{name}.weight"] = torch.from_numpy(
            np.asarray(tree["kernel"], np.float32).T.copy())
        sd[f"{prefix}{name}.bias"] = torch.from_numpy(
            np.array(tree["bias"], np.float32))

    def put_mean_buffers(prefix):
        # The reference nets register the smpl_mean_params as buffers
        # (init_pose/init_shape + init_cam or init_position, ref
        # model_hmr.py:86-92, model_copenet_singleview.py:86-92); they are
        # dataset constants, but a strict reference-side load_state_dict
        # requires the keys — emit them from the same asset npz.
        from ..models.regressor import load_mean_params

        pose, shape, cam = load_mean_params()
        sd[f"{prefix}init_pose"] = torch.from_numpy(pose[None].copy())
        sd[f"{prefix}init_shape"] = torch.from_numpy(shape[None].copy())
        if model_name == "copenet_singleview":
            sd[f"{prefix}init_position"] = torch.tensor(
                [[0.0, 0.0, 10.0 / 0.05]], dtype=torch.float32)
        else:
            sd[f"{prefix}init_cam"] = torch.from_numpy(cam[None].copy())
        if model_name != "hmr" and model_name != "muhmr":
            # The full-perspective reference nets define a deccam head that
            # forward never calls (dead layer, ref model_copenet.py:73 vs
            # :198-202); strict loads still require the keys — emit zeros.
            sd[f"{prefix}deccam.weight"] = torch.zeros(3, 1024)
            sd[f"{prefix}deccam.bias"] = torch.zeros(3)

    head_names = {
        "hmr": ("decpose", "decshape", "deccam"),
        "muhmr": ("decpose", "decshape", "deccam"),
        "copenet_singleview": ("decpose", "decshape"),
        "copenet_twoview": ("decpose", "decshape"),
        "copenet_twoview_sep": ("decpose", "decshape"),
    }[model_name]
    if model_name == "copenet_twoview_sep":
        for v in (0, 1):
            sub = f"model.copenet{v}."
            _export_resnet_flax_to_torch(
                params[f"trunk{v}"], stats[f"trunk{v}"], sd, sub)
            for name in ("fc1", "fc2") + head_names:
                put_linear(sub, name, params[f"core{v}"][name])
            put_mean_buffers(sub)
    else:
        _export_resnet_flax_to_torch(params["trunk"], stats["trunk"], sd,
                                     "model.")
        for name in ("fc1", "fc2") + tuple(
            n for n in head_names if n in params["core"]
        ):
            put_linear("model.", name, params["core"][name])
        put_mean_buffers("model.")
    torch.save({"state_dict": sd, "hyper_parameters": {}}, out_path)
    return out_path


def load_model_variables(model_name: str, ckpt: Optional[str] = None,
                         torch_ckpt: Optional[str] = None,
                         random_init: bool = False):
    """Inference-time weight loading shared by the serving/bench CLIs:
    returns ``(model, {"params", "batch_stats"})`` for one model family.
    Exactly one source must be given — ``ckpt``, ``torch_ckpt``, or
    ``random_init=True`` (fresh `model.init` weights, the rehearsal mode).

    ``ckpt`` is an orbax directory written by this framework (a TrainState
    from the trainer/converter, or a raw variables dict). The restore is
    template-free on purpose: the optimizer state in the checkpoint may
    belong to any optimizer variant (e.g. the ``train_reg_only``
    multi_transform) and serving never needs it — a TrainState template
    would reject exactly those checkpoints (the round-2 `--ckpt` defect).

    ``torch_ckpt`` is a reference PyTorch-Lightning ``.ckpt`` / bare state
    dict, converted in memory (the deployment contract
    `python server.py -p PORT -m file.ckpt`, ref README server
    instructions)."""
    from ..models import MODEL_REGISTRY, family_init_args
    from .state import create_train_state

    model = MODEL_REGISTRY[model_name]()
    n_sources = (ckpt is not None) + (torch_ckpt is not None) + random_init
    if n_sources != 1:
        raise ValueError(
            "provide exactly one of --ckpt, --torch-ckpt, or --random-init")
    if random_init:
        variables = model.init(
            jax.random.PRNGKey(0), *family_init_args(model_name, 1, 64))
        return model, variables
    if torch_ckpt is not None:
        import torch  # host-side conversion only — not the compute path

        blob = torch.load(torch_ckpt, map_location="cpu", weights_only=False)
        sd = blob.get("state_dict", blob) if isinstance(blob, dict) else blob
        lightning = any(k.startswith("model.") for k in sd)
        conv = convert_reference_checkpoint(sd, model_name, lightning=lightning)
        # init template supplies any batch_stats the converter doesn't carry
        state, _ = create_train_state(
            model, family_init_args(model_name, batch_size=1, img_res=64),
            jax.random.PRNGKey(0), lr=5e-5,
        )
        as_np = lambda tree: jax.tree.map(
            lambda a: np.asarray(a, np.float32), tree
        )
        return model, {
            "params": as_np(conv["params"]),
            "batch_stats": {**state.batch_stats,
                            **as_np(conv["batch_stats"])},
        }
    restored = ocp.StandardCheckpointer().restore(os.path.abspath(ckpt))
    if "params" not in restored:
        raise ValueError(
            f"{ckpt} holds no 'params' tree — not a TrainState/variables "
            "checkpoint of this framework")
    return model, {"params": restored["params"],
                   "batch_stats": restored.get("batch_stats", {})}


# ---------------------------------------------------------------------------
# CLI: reference Lightning .ckpt → orbax TrainState
# ---------------------------------------------------------------------------

def convert_ckpt_file_to_orbax(
    ckpt_path: str, model_name: str, out_dir: str, lr: float = 5e-5
) -> str:
    """Load a reference PyTorch-Lightning ``.ckpt`` (or a bare torch
    state-dict file), convert the weights, and write an orbax TrainState
    checkpoint that this framework's trainer/eval CLIs restore directly.
    The optimizer state is fresh (the reference optimizer state is not
    transferable). Returns the written path."""
    import torch  # host-side conversion tool only — not the compute path

    from ..models import MODEL_REGISTRY, family_init_args
    from .state import create_train_state

    blob = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    sd = blob.get("state_dict", blob) if isinstance(blob, dict) else blob
    lightning = any(k.startswith("model.") for k in sd)
    variables = convert_reference_checkpoint(sd, model_name, lightning=lightning)

    model = MODEL_REGISTRY[model_name]()
    state, _ = create_train_state(
        model, family_init_args(model_name, batch_size=1, img_res=64),
        jax.random.PRNGKey(0), lr=lr,
    )
    as_jnp = lambda tree: jax.tree.map(
        lambda a: np.asarray(a, dtype=np.float32), tree
    )
    state = state.replace(
        params=as_jnp(variables["params"]),
        batch_stats={**state.batch_stats, **as_jnp(variables["batch_stats"])},
    )
    out = os.path.abspath(out_dir)
    ckpt = ocp.StandardCheckpointer()
    ckpt.save(out, jax.device_get(state), force=True)
    ckpt.wait_until_finished()
    return out


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(
        description="Convert a reference PyTorch-Lightning checkpoint to an "
        "orbax TrainState (the north-star parity path: converted weights "
        "feed eval/compile_results and the serving CLIs)."
    )
    p.add_argument("--torch-ckpt", required=True, help=".ckpt / .pt file")
    p.add_argument("--model", required=True,
                   choices=("hmr", "muhmr", "copenet_singleview",
                            "copenet_twoview", "copenet_twoview_sep"))
    p.add_argument("--out", required=True, help="orbax output directory")
    p.add_argument("--platform", default="cpu", choices=("cpu", "tpu"),
                   help="conversion runs fine on cpu (default)")
    args = p.parse_args(argv)
    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    out = convert_ckpt_file_to_orbax(args.torch_ckpt, args.model, args.out)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()


