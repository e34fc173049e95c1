"""Reference-checkpoint interop: import AND export Keras weights.

The reference trains with ``tf.keras`` ``save_weights`` (TF object-based
checkpoints, models/model01.py:263-264 ``save``/``load``). A user migrating
from nbip/vae-mdl can bring their trained models along — and take models
trained here back:

    from vae_mdl_tpu.utils.import_reference import (
        load_reference_weights, save_reference_weights)
    params = load_reference_weights("saved_models/model01/best",
                                    "model01", params_template)
    save_reference_weights("saved_models/model01/exported", "model01",
                           trained_params)

Supported families and their reference object graphs (checkpoint keys are
the attribute paths):

- ``model01`` (MLP, models/model01.py:70-139): ``encoder.encode_x_to_z.
  {l1,l2,lmu,lstd}`` Dense layers and ``decoder.decode_z_to_x`` a
  3-layer ``Sequential`` (``layer_with_weights-N``).
- ``model02`` / ``model03`` / ``model05`` (conv, model02.py:25-80 =
  model03 = model05.py:24-81 modulo the head width): ``encoder.convs``
  Sequential of Conv2D + ``encoder.fc`` Dense; ``decoder.fc`` Dense +
  ``decoder.deconvs`` Sequential of Conv2DTranspose ending in a Conv2D
  head.
- ``model04`` (model04.py:25-77): the conv skeleton with 5-GLU stacks on
  both sides (each GLU nests a ``conv`` Sequential of two Conv2D,
  modules/glu.py:11-28) and a Conv2DTranspose as the DL head.
- ``model06`` (model06.py:140-191): the conv family plus the two
  top-level ``mlp_encoder`` / ``mlp_decoder`` BasicBlocks of the second
  stochastic layer.

Weight-layout facts (validated numerically in
tests/test_import_reference.py against live Keras layers):

- Dense and Conv2D kernels share flax's layout ([in,out] / [kh,kw,in,out])
  — copied as-is.
- Conv2DTranspose kernels are [kh, kw, OUT, IN] in Keras while flax's
  ``nn.ConvTranspose`` wants [kh, kw, in, out] and composes the transposed
  conv WITHOUT the spatial mirror TF applies, so the import transform is
  ``transpose(0,1,3,2)`` + a spatial flip (exact to f32 ulp).
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import numpy as np

from vae_mdl_tpu.utils.trees import path_tuple

_SUFFIX = "/.ATTRIBUTES/VARIABLE_VALUE"


def _leaves_by_path(params):
    """Index a pytree's leaves by their stringified key path."""
    return {
        path_tuple(path): leaf
        for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]
    }


def _require_full_tree(params, fn: str):
    """Both directions map against the FULL variables tree (the one
    ``model.init`` / ``TrainState.params`` carries, with the top-level
    'params' collection) — fail fast with the actual contract instead of a
    misleading missing-leaf KeyError deeper in."""
    if not hasattr(params, "keys") or "params" not in params:
        raise ValueError(
            f"{fn} expects the full variables tree (with the top-level "
            "'params' collection), e.g. TrainState.params or model.init(...) "
            f"— got top-level keys {list(getattr(params, 'keys', list)())!r}")


def _model01_map() -> Dict[Tuple[str, ...], Tuple[str, str]]:
    enc = "encoder/encode_x_to_z"
    dec = "decoder/decode_z_to_x"
    return {
        ("encoder", "MLPBlock_0", "Dense_0"): (f"{enc}/l1", "dense"),
        ("encoder", "MLPBlock_0", "Dense_1"): (f"{enc}/l2", "dense"),
        ("encoder", "MLPBlock_0", "Dense_2"): (f"{enc}/lmu", "dense"),
        ("encoder", "MLPBlock_0", "Dense_3"): (f"{enc}/lstd", "dense"),
        ("decoder", "Dense_0"): (f"{dec}/layer_with_weights-0", "dense"),
        ("decoder", "Dense_1"): (f"{dec}/layer_with_weights-1", "dense"),
        ("decoder", "out"): (f"{dec}/layer_with_weights-2", "dense"),
    }


def _conv_family_map(params) -> Dict[Tuple[str, ...], Tuple[str, str]]:
    """model02/03/05: encoder convs + fc, decoder fc + deconvs(+conv head).
    Layer counts are read off the params template so the one table serves
    every head width."""
    tree = params["params"]
    n_enc = sum(1 for k in tree["encoder"] if k.startswith("conv_"))
    n_dec = sum(1 for k in tree["decoder"] if k.startswith("conv_"))
    m: Dict[Tuple[str, ...], Tuple[str, str]] = {
        ("encoder", "Dense_0"): ("encoder/fc", "dense"),
        ("decoder", "Dense_0"): ("decoder/fc", "dense"),
    }
    for i in range(n_enc):
        m[("encoder", f"conv_{i}")] = (
            f"encoder/convs/layer_with_weights-{i}", "conv")
    for i in range(n_dec):
        # the final Sequential entry is a plain Conv2D likelihood head
        kind = "deconv" if i < n_dec - 1 else "conv"
        m[("decoder", f"conv_{i}")] = (
            f"decoder/deconvs/layer_with_weights-{i}", kind)
    return m


def _model06_map(params) -> Dict[Tuple[str, ...], Tuple[str, str]]:
    """model06 = the conv family plus the two top-level MLP blocks of the
    second stochastic layer (model06.py:188-191: ``mlp_encoder`` /
    ``mlp_decoder`` BasicBlocks)."""
    m = _conv_family_map(params)
    for ours, ref in (("mlp_encoder_1", "mlp_encoder"),
                      ("mlp_decoder_1", "mlp_decoder")):
        for dn, rn in (("Dense_0", "l1"), ("Dense_1", "l2"),
                       ("Dense_2", "lmu"), ("Dense_3", "lstd")):
            m[(ours, dn)] = (f"{ref}/{rn}", "dense")
    return m


def _model04_map() -> Dict[Tuple[str, ...], Tuple[str, str]]:
    """model04 (model04.py:25-77): encoder ``convs`` = 3 Conv2D + 5 GLU,
    decoder ``deconvs`` = Conv2D + 5 GLU + 2 Conv2DTranspose (the final
    transpose IS the 6-channel DL head). Each reference GLU
    (modules/glu.py:5-33) holds ``conv`` = Sequential(Conv2D, Conv2D),
    mapping onto our GLU's Conv_0/Conv_1."""
    m: Dict[Tuple[str, ...], Tuple[str, str]] = {
        ("encoder", "Dense_0"): ("encoder/fc", "dense"),
        ("decoder", "Dense_0"): ("decoder/fc", "dense"),
        ("decoder", "pre_0"): ("decoder/deconvs/layer_with_weights-0",
                               "conv"),
        ("decoder", "conv_0"): ("decoder/deconvs/layer_with_weights-6",
                                "deconv"),
        ("decoder", "conv_1"): ("decoder/deconvs/layer_with_weights-7",
                                "deconv"),
    }
    for i in range(3):
        m[("encoder", f"conv_{i}")] = (
            f"encoder/convs/layer_with_weights-{i}", "conv")
    for g in range(5):
        for tower, base in (("encoder", f"encoder/convs/"
                                        f"layer_with_weights-{3 + g}/conv"),
                            ("decoder", f"decoder/deconvs/"
                                        f"layer_with_weights-{1 + g}/conv")):
            m[(tower, f"glu_{g}", "Conv_0")] = (
                f"{base}/layer_with_weights-0", "conv")
            m[(tower, f"glu_{g}", "Conv_1")] = (
                f"{base}/layer_with_weights-1", "conv")
    return m


def _transform_kernel(kind: str, arr: np.ndarray) -> np.ndarray:
    if kind == "deconv":
        # Keras [kh,kw,out,in] -> flax [kh,kw,in,out], plus the spatial
        # mirror TF's conv2d_transpose implies (module docstring). The
        # transpose swaps the two axes the flips don't touch, so this
        # transform is an involution — it converts BOTH directions.
        return np.ascontiguousarray(
            np.transpose(arr, (0, 1, 3, 2))[::-1, ::-1])
    return arr


def _mapping_for(model_name: str, params) -> Dict[Tuple[str, ...],
                                                  Tuple[str, str]]:
    if model_name == "model01":
        return _model01_map()
    if model_name in ("model02", "model03", "model05"):
        return _conv_family_map(params)
    if model_name == "model04":
        return _model04_map()
    if model_name == "model06":
        return _model06_map(params)
    raise NotImplementedError(
        f"no reference weight mapping for {model_name!r}: supported "
        "families are model01-model06 (ladders/digits are this repo's "
        "own additions with no reference checkpoints to import)")


def load_reference_weights(ckpt_prefix: str, model_name: str, params):
    """Read a reference ``save_weights`` checkpoint into a params pytree.

    ``params`` is the shape template (from ``model.init`` or
    ``create_train_state(...).params``); the return value is a new pytree
    with every mapped leaf replaced by the imported float32 weight.
    Unknown families, missing checkpoint keys, shape mismatches AND mapping
    gaps raise with actionable messages: every leaf of the template must
    receive an imported value, so a partial mapping can never silently yield
    a model mixing trained and randomly-initialised weights.
    """
    _require_full_tree(params, "load_reference_weights")
    mapping = _mapping_for(model_name, params)

    try:
        from tensorflow.python.training import py_checkpoint_reader
        reader = py_checkpoint_reader.NewCheckpointReader(ckpt_prefix)
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "importing reference checkpoints needs tensorflow "
            "(pip install tensorflow-cpu)") from e

    available = set(reader.get_variable_to_shape_map())
    # index template leaves by their string path for lookup
    leaves = _leaves_by_path(params)

    updates = {}
    for flax_path, (ref_base, kind) in mapping.items():
        for pname, ref_var in (("kernel", "kernel"), ("bias", "bias")):
            key = ref_base + "/" + ref_var + _SUFFIX
            full_flax = ("params",) + flax_path + (pname,)
            if full_flax not in leaves:
                raise KeyError(
                    f"params template has no leaf {full_flax} — wrong "
                    f"model config for {model_name!r}?")
            if key not in available:
                raise KeyError(
                    f"checkpoint {ckpt_prefix!r} lacks {key!r}; is this a "
                    f"{model_name} save_weights checkpoint? available keys "
                    f"include: {sorted(available)[:4]} ...")
            arr = reader.get_tensor(key)
            if pname == "kernel":
                arr = _transform_kernel(kind, arr)
            want = leaves[full_flax].shape
            if tuple(arr.shape) != tuple(want):
                raise ValueError(
                    f"shape mismatch importing {key!r} -> {full_flax}: "
                    f"checkpoint {tuple(arr.shape)} vs template {want}")
            updates[full_flax] = np.asarray(arr, np.float32)

    # template -> mapping completeness: a mapping gap (new family variant,
    # missed submodule) must be an error, not a random-weight layer
    unmapped = sorted(p for p in leaves if p not in updates)
    if unmapped:
        raise KeyError(
            f"the {model_name!r} weight mapping covers {len(updates)} of "
            f"{len(leaves)} template leaves; unmapped: "
            f"{['/'.join(p) for p in unmapped]} — extend _mapping_for so "
            "every parameter is imported")

    def replace(path, leaf):
        return updates.get(path_tuple(path), leaf)

    return jax.tree_util.tree_map_with_path(replace, params)


def save_reference_weights(ckpt_prefix: str, model_name: str,
                           params) -> None:
    """The reverse direction: write a params pytree as a reference-layout
    Keras TF-format checkpoint (the object-graph key layout ``model.save``
    produces, models/model01.py:263-264) — so a model trained HERE can be
    loaded back by the reference's tooling, or round-tripped as a format
    check. Same family coverage and kernel transforms as the import (the
    deconv transform is an involution, so one function serves both ways).
    Needs tensorflow at call time, like the import.
    """
    _require_full_tree(params, "save_reference_weights")
    mapping = _mapping_for(model_name, params)
    try:
        import tensorflow as tf
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "writing reference checkpoints needs tensorflow "
            "(pip install tensorflow-cpu)") from e

    leaves = _leaves_by_path(params)

    class _Node(tf.Module):
        pass

    roots: Dict[str, "_Node"] = {}
    for flax_path, (ref_base, kind) in mapping.items():
        obj = None
        for part in ref_base.split("/"):
            if obj is None:
                obj = roots.setdefault(part, _Node())
                continue
            nxt = getattr(obj, part, None)
            if nxt is None:
                nxt = _Node()
                setattr(obj, part, nxt)
            obj = nxt
        for pname in ("kernel", "bias"):
            full_flax = ("params",) + flax_path + (pname,)
            if full_flax not in leaves:
                raise KeyError(
                    f"params template has no leaf {full_flax} — wrong "
                    f"model config for {model_name!r}?")
            arr = np.asarray(leaves[full_flax], np.float32)
            if pname == "kernel":
                arr = _transform_kernel(kind, arr)
            setattr(obj, pname, tf.Variable(arr))
    tf.train.Checkpoint(**roots).write(ckpt_prefix)
