"""Objective dispatch: one entry point from a VAE forward pass to the bound.

Picks the exact-parity loss for each stochastic depth:
  L == 1 -> iwae_loss            (/root/reference/models/loss.py:26-55)
  L == 2 -> two_layer_iwae_loss  (/root/reference/models/model06.py:38-72,
                                  per-layer kl1/kl2 metrics preserved)
  L >= 3 -> hierarchical_iwae_loss (the generic ladder the reference only
                                  prototyped in tests/test_hierarchical_setup.py)
"""
from __future__ import annotations

from typing import Tuple

import jax

from vae_mdl_tpu.distributions import DistributionTuple, Normal
from vae_mdl_tpu.models.losses import (
    Metrics,
    _bits_per_dim,
    _reduce,
    hierarchical_iwae_loss,
    iwae_loss,
    two_layer_iwae_loss,
)


def bound_terms(
    prior: Normal,
    Qs: Tuple[DistributionTuple, ...],
    Ps: Tuple[DistributionTuple, ...],
    pxz: DistributionTuple,
    x: jax.Array,
    stop_q_params: bool = False,
) -> Tuple[jax.Array, list]:
    """``(lpxz, [kl_top, kl_1, ..., kl_{L-1}])`` — the bound's terms, each
    ``[k, B]``, at any stochastic depth. Every KL term is the per-sample
    log-ratio ``log p - log q`` (so the bound is ``lpxz + beta * sum``).

    ``stop_q_params=True`` evaluates each q's log-prob under
    stop-gradiented DISTRIBUTION PARAMETERS while the attached sample z
    stays pathwise-live — the score-function-free log-weight of the DReG
    estimator (Tucker et al. 2019, arXiv:1810.04152, eq. 12). Distributions
    are flax.struct pytrees, so the detached copy is one tree_map.

    NOTE: stopping the evaluated parameter values matches eq. 12 only when
    no q's parameters depend on sampled latents — i.e. single-layer models,
    where the only parameter input is the constant x. For hierarchical
    posteriors q_i(z_i | z_{i-1}) the live route z_{i-1} -> parameters must
    be kept; ``training_loss_fn`` does that by re-evaluating the inference
    maps with stop-gradiented WEIGHTS at the live latents
    (``VAE.posterior_at``) instead of using this flag.
    """
    def qd(q):
        return (jax.tree.map(jax.lax.stop_gradient, q.dist)
                if stop_q_params else q.dist)

    top = Qs[-1]
    lpxz = _reduce(pxz.dist, x, pxz.axes)
    kls = [
        _reduce(prior, top.z, prior.event_axes)
        - _reduce(qd(top), top.z, top.axes)
    ]
    for i in range(len(Qs) - 1):
        kls.append(
            _reduce(Ps[i].dist, Qs[i].z, Ps[i].axes)
            - _reduce(qd(Qs[i]), Qs[i].z, Qs[i].axes)
        )
    return lpxz, kls


def log_weights(
    prior: Normal,
    Qs: Tuple[DistributionTuple, ...],
    Ps: Tuple[DistributionTuple, ...],
    pxz: DistributionTuple,
    x: jax.Array,
    beta: float = 1.0,
    stop_q_params: bool = False,
) -> jax.Array:
    """Unnormalised importance log-weights ``[k, B]`` for any stochastic
    depth — the quantity the 5000-IS evaluator streams over k-chunks (the
    reference reduces it immediately, models/loss.py:28-37). Bound terms go
    through losses._reduce — ONE source of truth for train and eval."""
    lpxz, kls = bound_terms(prior, Qs, Ps, pxz, x, stop_q_params=stop_q_params)
    kl = kls[0]
    for term in kls[1:]:
        kl = kl + term
    return lpxz + beta * kl


def compute_loss(
    prior: Normal,
    Qs: Tuple[DistributionTuple, ...],
    Ps: Tuple[DistributionTuple, ...],
    pxz: DistributionTuple,
    x: jax.Array,
    beta: float = 1.0,
    objective: str = "iwae",
    free_bits: float = 0.0,
) -> Tuple[jax.Array, Metrics]:
    if free_bits > 0.0 and objective != "elbo":
        raise ValueError(
            "free_bits floors per-layer EXPECTED KLs, which only decompose "
            "out of the ELBO objective (Kingma et al. 2016 §C.8); got "
            f"objective={objective!r}. Use objective='elbo' with free_bits, "
            "or free_bits=0."
        )
    if objective == "iwae_dreg":
        # DReG is a GRADIENT estimator for the unchanged IWAE bound — any
        # value-only path (eval, the 5000-IS harness, metrics) computes the
        # plain bound. Training gradients come from models.objective.
        # training_loss_fn, which every train-step body uses.
        objective = "iwae"
    if objective == "elbo":
        # plain ELBO at any depth: mean over importance samples instead of
        # logmeanexp (reference elbo_loss, models/loss.py:58-70, generalised)
        import jax.numpy as jnp

        if free_bits > 0.0:
            return _free_bits_elbo(prior, Qs, Ps, pxz, x, beta, free_bits)
        lw = log_weights(prior, Qs, Ps, pxz, x, beta=beta)
        elbo = jnp.mean(lw)
        bpd = _bits_per_dim(elbo, x)
        return -elbo, {"elbo": elbo, "bpd": bpd, "loss": -elbo}
    L = len(Qs)
    if L == 1:
        return iwae_loss(x, Qs[0].z, prior, Qs[0].dist, pxz.dist, beta=beta)
    if L == 2:
        return two_layer_iwae_loss(x, prior, Qs[0], Qs[1], Ps[0], pxz,
                                   beta=beta)
    return hierarchical_iwae_loss(
        x,
        Qs,
        Ps,
        pxz,
        DistributionTuple(prior, None, axes=prior.event_axes),
        beta=beta,
    )


def _free_bits_elbo(prior, Qs, Ps, pxz, x, beta, free_bits):
    """ELBO with per-layer free bits (Kingma et al. 2016, arXiv:1606.04934
    §C.8): each stochastic layer's EXPECTED KL (batch+sample mean) is
    floored at ``free_bits`` nats inside the objective, so the optimizer
    gets no reward — and no gradient — for compressing a layer below the
    floor. The standard posterior-collapse remedy for ladder VAEs; pairs
    with the ``beta_warmup_steps`` annealer and the active-units diagnostic
    (evaluation.active_units).

    Metrics report the TRUE (unfloored) ELBO alongside the floored training
    loss and the per-layer expected KLs, ordered [top, z1, ..., z_{L-1}]
    to match ``bound_terms``.
    """
    import jax.numpy as jnp

    lpxz, kls = bound_terms(prior, Qs, Ps, pxz, x)
    # E[KL_i] >= 0 up to MC noise; the floor applies to the estimate
    kl_means = [-jnp.mean(t) for t in kls]
    floored = [jnp.maximum(free_bits, m) for m in kl_means]
    rec = jnp.mean(lpxz)
    loss = -(rec - beta * sum(floored))

    kl_sum = kls[0]
    for term in kls[1:]:
        kl_sum = kl_sum + term
    elbo = jnp.mean(lpxz + beta * kl_sum)
    bpd = _bits_per_dim(elbo, x)
    n_floored = sum(
        (m < free_bits).astype(jnp.float32) for m in kl_means
    )
    return loss, {
        "elbo": elbo,
        "bpd": bpd,
        "loss": loss,
        "kl": kl_means,
        "kl_floored_layers": n_floored,
    }


# -- DReG: doubly-reparameterized IWAE gradients ------------------------------
#
# Tucker et al. 2019 (arXiv:1810.04152): the IWAE bound's total-derivative
# gradient w.r.t. the INFERENCE parameters contains a score-function term
# whose variance does not vanish even at the optimal posterior. DReG removes
# it by double reparameterisation: the generative half keeps the standard
# IWAE gradient (normalised weights w~), the inference half is estimated
# pathwise-only with squared weights (w~^2) through a log-weight whose
# q-distribution parameters are stop-gradiented while z stays live.
#
# JAX makes the parameter split structural: the VAE family's variables tree
# partitions by submodule name (encoder / mlp_encoder_* vs decoder /
# mlp_decoder_*), and each surrogate runs the forward with the OTHER half's
# leaves stop-gradiented — sg is identity in the forward pass, so both
# halves see bit-identical activations (and XLA CSE can share them).
#
# The inference surrogate's log-weight needs one more distinction: eq. 12
# detaches only the DIRECT phi-dependence of the q densities, so the
# parameter maps are re-evaluated with fully stop-gradiented WEIGHTS at the
# pathwise-live latents (VAE.posterior_at). For hierarchical posteriors
# q_i(z_i | z_{i-1}) this keeps the live route z_{i-1} -> parameters that
# stopping the evaluated parameter values would sever (which would bias the
# encoder gradient at n_stochastic >= 2; pinned in tests/test_objectives.py
# against an explicit two-stage construction of eq. 12).

def _dreg_half(name: str) -> str:
    if name == "encoder" or name.startswith("mlp_encoder"):
        return "inference"
    if name == "decoder" or name.startswith("mlp_decoder"):
        return "generative"
    raise ValueError(
        f"objective='iwae_dreg' cannot classify module {name!r} as "
        "inference or generative; DReG is implemented for the VAE family "
        "(ModelConfig), whose parameters split cleanly. The ladder families "
        "share top-down parameters between inference and generation, where "
        "the estimator's parameter partition is not defined."
    )


def stop_gradient_half(variables, half: str):
    """Return ``variables`` with the ``half`` ('inference'|'generative')
    submodule leaves wrapped in stop_gradient (forward-identical)."""
    params = variables["params"]
    stopped = {
        name: (jax.tree.map(jax.lax.stop_gradient, sub)
               if _dreg_half(name) == half else sub)
        for name, sub in params.items()
    }
    return {**variables, "params": stopped}


def training_loss_fn(model, cfg, prior, x, k: int, sample_rng, beta):
    """Build ``loss_fn(params) -> (loss, metrics)`` for
    ``jax.value_and_grad(..., has_aux=True)`` — the ONE construction every
    train-step body (jit, shard_map, ZeRO-1) uses.

    For the reference objectives ('iwae', 'elbo') this is the plain forward
    + ``compute_loss``. For 'iwae_dreg' the returned loss VALUE is still the
    exact IWAE bound (so logging, best-val selection and the skip rule see
    the real objective), but its GRADIENT is the DReG estimator, assembled
    from two forward passes with complementary parameter halves
    stop-gradiented (see module comment above).
    """
    objective = getattr(cfg.model, "objective", "iwae")
    free_bits = getattr(cfg.model, "free_bits", 0.0)
    rngs = {"sample": sample_rng}

    if free_bits > 0.0 and objective != "elbo":
        # fail at step construction, not at the first eval trace: the dreg
        # branch below never consults free_bits, so without this check a
        # free_bits+dreg run would train with the floor silently dropped
        # and then die eval_interval steps in when make_eval_step passes
        # both to compute_loss
        raise ValueError(
            "free_bits floors per-layer EXPECTED KLs, which only decompose "
            "out of the ELBO objective (Kingma et al. 2016 §C.8); got "
            f"objective={objective!r}. Use objective='elbo' with free_bits, "
            "or free_bits=0."
        )

    if objective != "iwae_dreg":
        def loss_fn(params):
            Qs, Ps, pxz = model.apply(params, x, k, rngs=rngs)
            return compute_loss(prior, Qs, Ps, pxz, x, beta=beta,
                                objective=objective, free_bits=free_bits)
        return loss_fn

    from vae_mdl_tpu.models.vae import VAE

    if not isinstance(model, VAE):
        raise ValueError(
            "objective='iwae_dreg' is implemented for the VAE family "
            f"(ModelConfig); got {type(model).__name__}."
        )

    import jax.numpy as jnp

    def loss_fn(params):
        # generative half: inference leaves stopped -> the standard IWAE
        # surrogate sum_k sg(w~_k) log w_k yields exactly the IWAE gradient
        # for the decoder parameters
        Qs, Ps, pxz = model.apply(
            stop_gradient_half(params, "inference"), x, k, rngs=rngs
        )
        lw = log_weights(prior, Qs, Ps, pxz, x, beta=beta)
        w = jax.lax.stop_gradient(jax.nn.softmax(lw, axis=0))
        dec_surr = -jnp.mean(jnp.sum(w * lw, axis=0))

        # true bound value + the standard metrics dict (forward values are
        # identical across both halves; compute once here)
        loss, metrics = compute_loss(prior, Qs, Ps, pxz, x, beta=beta,
                                     objective="iwae")

        # inference half: generative leaves stopped at entry so the
        # latents stay pathwise-live through the live encoder; squared
        # weights
        Qs2, Ps2, pxz2 = model.apply(
            stop_gradient_half(params, "generative"), x, k, rngs=rngs
        )
        # eq. 12's log-weight: the q densities' PARAMETER MAPS are
        # phi-stopped but applied to the live latents — re-run the
        # inference maps with fully stop-gradiented weights at the live
        # zs (VAE.posterior_at). For one stochastic layer this equals
        # stopping the evaluated parameters (x is constant); for
        # hierarchical posteriors it keeps the live route
        # z_{i-1} -> q_i's parameters that value-stopping would sever
        # (and eq. 12 keeps). sg is forward-identity, so XLA CSE can
        # fold this pass into the two above.
        zs = tuple(q.z for q in Qs2)
        sg_params = jax.tree.map(jax.lax.stop_gradient, params)
        Qs_hat = model.apply(sg_params, x, zs, method=VAE.posterior_at)
        lw_hat = log_weights(prior, Qs_hat, Ps2, pxz2, x, beta=beta)
        enc_surr = -jnp.mean(jnp.sum(w * w * lw_hat, axis=0))

        surr = dec_surr + enc_surr
        # value = the IWAE bound; gradient = the DReG estimator
        out = jax.lax.stop_gradient(loss) + surr - jax.lax.stop_gradient(surr)
        return out, metrics

    return loss_fn
