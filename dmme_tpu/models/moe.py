"""Mixture-of-Experts FFN — token-choice top-k routing with static
capacity (Shazeer et al. 2017; GShard, Lepikhin et al. 2020; Switch,
Fedus et al. 2021), built for expert parallelism on a TPU mesh.

No reference counterpart (the reference's largest denoiser is a 35.7M
dense UNet) — this is the framework's sparse-scaling axis for the DiT
family: parameters grow ~linearly with ``num_experts`` at near-constant
per-token FLOPs.

TPU-first mechanics: routing is expressed entirely as one-hot dispatch /
combine einsums over a STATIC capacity axis — no gather/scatter, no
dynamic shapes, so the whole layer is three MXU matmuls per expert plus
elementwise masks, and XLA can lay the (experts, capacity, d) activations
out sharded over the ``expert`` mesh axis (parallel/mesh.py adds the axis;
expert weight leaves shaped (E, d_in, d_out) shard on axis 0 via
fsdp_param_spec, and the SPMD partitioner inserts the token all-to-alls
from the dispatch/combine contractions).

Routing health (round 5, measured on-chip — docs/training_demo.md "MoE
routing health" for the collapse → fix arc): training-time selection
goes through exploration noise (noisy top-k, Shazeer et al. 2017) and a
Sinkhorn-balanced transport (Megatron's sinkhorn router), and the
transport is also the SwAV-style self-labeling target for the router
softmax (Caron et al. 2020) so the deterministic eval-time argmax
converges to the balanced assignment instead of collapsing.

Losses: the Switch load-balance auxiliary (E · Σ_e f_e · P_e, = 1 when
perfectly balanced), the SwAV alignment CE above, and the RAW router
z-loss (St-MoE, Zoph et al. 2022) are ``sow``-ed into the ``"losses"``
collection; the training harnesses (every LitDDPM-family
``make_loss_fn``, via the shared ``LitDDPM.loss_model_fn``/
``add_moe_aux`` helpers) add them to the diffusion loss as
``moe_aux_weight·(aux + align) + moe_z_weight·z`` when
``moe_aux_weight > 0`` — apply with ``mutable=["losses"]`` to read them.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn


class MoEMlp(nn.Module):
    """Drop-in replacement for a transformer FFN: (N, T, d) → (N, T, d).

    ``capacity_factor`` bounds per-expert work: each expert processes at
    most ``ceil(tokens · top_k / E · capacity_factor)`` tokens per batch;
    overflowing tokens are dropped from that expert (their residual path
    still carries them — standard Switch behavior).
    """

    num_experts: int
    mlp_dim: int
    top_k: int = 2
    capacity_factor: float = 1.25
    #: std of the exploration noise added to router logits during training
    #: (noisy top-k gating, Shazeer et al. 2017 §2.1). Without it the argmax
    #: routing of a fresh model is degenerate — at init the adaLN-Zero
    #: blocks are identity, so the router sees near-identical LayerNormed
    #: patch embeddings whose shared component picks ONE winner for most
    #: tokens; that expert then trains fastest and rich-get-richer locks in
    #: (measured on-chip: max f_e 0.91 at init, stuck at ~0.74 after 2k
    #: steps with the aux loss alone — runs/moe_routing_probe.jsonl).
    #: Noise comparable to the logit scale (the z-loss keeps logits O(1))
    #: makes early routing exploratory so every expert receives tokens and
    #: gradient; as router logit gaps grow past the noise, routing anneals
    #: toward deterministic. Eval / deterministic=True is noise-free.
    router_noise: float = 1.0
    #: Sinkhorn iterations balancing the TRAINING-time assignment matrix
    #: (Megatron-LM's sinkhorn router; Clark et al. 2022). Noise alone is
    #: not enough: once the warmup LR ramp grows router logit gaps past the
    #: noise, argmax routing re-locks (measured: max f_e back to 0.72 by
    #: step 600), and the Switch aux is gameable — the router can lower an
    #: overloaded expert's MEAN prob toward 1/E while keeping it the
    #: per-token argmax, so the aux saturates without balancing f_e.
    #: Sinkhorn instead balances the selection itself: iterate row/column
    #: normalization of softmax(logits) so every expert receives ~s·k/E
    #: tokens, then top-k on the balanced matrix. Gates still come from the
    #: RAW softmax, so the main loss trains the router to agree with the
    #: balanced assignment — eval-time argmax routing (deterministic=True:
    #: no sinkhorn, batch-independent) converges to balance because that is
    #: the routing the experts were trained under. 0 = off.
    sinkhorn_iters: int = 8
    deterministic: bool = True
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        n, t, d = x.shape
        e = self.num_experts
        k = self.top_k
        assert 1 <= k <= e, (k, e)
        s = n * t
        capacity = max(1, math.ceil(s * k / e * self.capacity_factor))
        capacity = min(capacity, s)
        xs = x.reshape(s, d)

        # ---- router (f32 for a stable softmax regardless of compute dtype)
        logits = nn.Dense(
            e, dtype=jnp.float32, param_dtype=self.param_dtype, name="router"
        )(xs.astype(jnp.float32))
        if (
            not self.deterministic
            and self.router_noise > 0
            and self.has_rng("dropout")
        ):
            logits = logits + self.router_noise * jax.random.normal(
                self.make_rng("dropout"), logits.shape, jnp.float32
            )
        probs = jax.nn.softmax(logits, axis=-1)  # (s, e)

        # selection matrix: balanced by sinkhorn during training (see the
        # sinkhorn_iters note), the raw probs at eval. Gates are ALWAYS
        # taken from the raw probs below.
        sel = probs
        if not self.deterministic and self.sinkhorn_iters > 0:
            for _ in range(self.sinkhorn_iters):
                sel = sel / (jnp.sum(sel, axis=0, keepdims=True) + 1e-9)
                sel = sel / (jnp.sum(sel, axis=1, keepdims=True) + 1e-9)
            sel = jax.lax.stop_gradient(sel)
            # SwAV-style self-labeling (Caron et al. 2020): the balanced
            # transport is the router's training target. Without this the
            # raw argmax drifts back to collapse even while the balanced
            # selection trains every expert (measured: max f_e 0.88 by
            # step 1000) — balanced *selection* alone puts no pressure on
            # the *logits*. The CE rides the aux bucket (moe_aux_weight).
            align = -jnp.mean(
                jnp.sum(sel * jax.nn.log_softmax(logits), axis=-1)
            )
            self.sow("losses", "moe_align", align)

        # ---- top-k token-choice assignment, one round per k (k is 1 or 2
        # in practice; rounds are unrolled python — static for XLA)
        remaining = sel
        masks, gates = [], []
        for _ in range(k):
            idx = jnp.argmax(remaining, axis=-1)                 # (s,)
            mask = jax.nn.one_hot(idx, e, dtype=jnp.float32)     # (s, e)
            gates.append(jnp.sum(probs * mask, axis=-1))         # (s,)
            masks.append(mask)
            remaining = remaining * (1.0 - mask)
        if k > 1:  # GShard: renormalize the chosen gates to sum to 1
            denom = sum(gates) + 1e-9
            gates = [g / denom for g in gates]

        # ---- positions within each expert's capacity, rounds stacked so a
        # round-2 token queues behind round-1 occupants
        combine = jnp.zeros((s, e, capacity), jnp.float32)
        kept_counts = jnp.zeros((e,), jnp.float32)
        for mask, gate in zip(masks, gates):
            pos = jnp.cumsum(mask, axis=0) - 1.0 + kept_counts[None, :]
            pos = jnp.sum(pos * mask, axis=-1)                   # (s,)
            kept = (pos < capacity).astype(jnp.float32) * jnp.sum(mask, -1)
            kept_counts = kept_counts + jnp.sum(mask * kept[:, None], axis=0)
            pos_oh = jax.nn.one_hot(
                pos.astype(jnp.int32), capacity, dtype=jnp.float32
            )
            combine = combine + (
                (gate * kept)[:, None, None] * mask[:, :, None] * pos_oh[:, None, :]
            )
        dispatch = (combine > 0.0).astype(self.dtype)            # (s, e, c)

        # ---- expert FFNs: three einsums, all MXU matmuls
        w_in = self.param(
            "w_in", nn.initializers.lecun_normal(), (e, d, self.mlp_dim),
            self.param_dtype,
        )
        b_in = self.param(
            "b_in", nn.initializers.zeros, (e, 1, self.mlp_dim),
            self.param_dtype,
        )
        w_out = self.param(
            "w_out", nn.initializers.lecun_normal(), (e, self.mlp_dim, d),
            self.param_dtype,
        )
        b_out = self.param(
            "b_out", nn.initializers.zeros, (e, 1, d), self.param_dtype
        )
        expert_in = jnp.einsum("sec,sd->ecd", dispatch, xs.astype(self.dtype))
        h = jnp.einsum("ecd,edf->ecf", expert_in, w_in.astype(self.dtype))
        h = nn.gelu(h + b_in.astype(self.dtype), approximate=True)
        out = jnp.einsum("ecf,efd->ecd", h, w_out.astype(self.dtype))
        out = out + b_out.astype(self.dtype)
        y = jnp.einsum("sec,ecd->sd", combine.astype(self.dtype), out)

        # ---- losses for the harness (collected via mutable=["losses"])
        # Switch aux: E * Σ_e (fraction routed to e, round 1) * (mean prob)
        f_e = jnp.mean(masks[0], axis=0)
        p_e = jnp.mean(probs, axis=0)
        self.sow("losses", "moe_aux", e * jnp.sum(f_e * p_e))
        # routing-health diagnostics (separate collection so the training
        # loss never sums them): per-expert routed fraction, round 1 —
        # read with mutable=["moe_stats"]; scripts/moe_routing_probe.py
        # and tests/test_moe.py watch these for expert collapse
        self.sow("moe_stats", "f_e", f_e)
        # router z-loss: keeps logits small / softmax well-conditioned.
        # Sown RAW — the harness applies the single documented weight
        # (LitDDPM.moe_z_weight, default 1e-3 per St-MoE); pre-scaling here
        # double-counted against moe_aux_weight (ADVICE r4)
        z = jax.scipy.special.logsumexp(logits, axis=-1)
        self.sow("losses", "moe_z", jnp.mean(jnp.square(z)))

        return y.reshape(n, t, d)
