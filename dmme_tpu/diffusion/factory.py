"""Generation-time sampler override — one shared factory.

Used by both the ``sample`` CLI subcommand and the HTTP server so the
sampler-name → algorithm mapping cannot drift between them. The override
REUSES the trained model's schedule and output parameterization (a
cosine-schedule IDDPM served through DPM-Solver must integrate the ᾱ it
was trained on — rebuilding a default linear schedule would silently
produce garbage), and adapts variance-learning (2C-channel) models to the
ε-only contract via ``models.eps_only``.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import dmme_tpu.equations as eq
from dmme_tpu.diffusion.ddim import DDIM
from dmme_tpu.diffusion.dpm_solver import DPMSolverPP
from dmme_tpu.diffusion.edm import EDM
from dmme_tpu.diffusion.flow import FlowMatching
from dmme_tpu.diffusion.iddpm import IDDPM
from dmme_tpu.diffusion.unipc import UniPC

# unipc defaults to 10 NFE — the very-low-NFE regime its corrector targets;
# flow's 25 midpoint steps = 50 NFE (halve steps or set order=1 for fewer)
STEP_DEFAULTS = {"ddim": 50, "dpm": 20, "edm": 18, "unipc": 10, "flow": 25}
# drive the UNet module (feature-capture API), not a model_fn
MODULE_SAMPLERS = ("cached", "deep", "deep_dpm")


def make_module_sampler(
    base,
    name: str,
    steps: Optional[int] = None,
    refresh_interval: int = 2,
    cache_depth: int = 1,
    conditional: bool = False,
):
    """Algorithm for the module-driven fast samplers (feature-caching):
    ``cached`` = encoder reuse (CachedDDIM), ``deep`` = deep-core caching
    (DeepCachedDDIM), ``deep_dpm`` = deep-core caching on the
    DPM-Solver++(2M) update (DeepCachedDPM). These need the UNet module
    itself (feature-capture API) and do not compose with the CFG
    wrapper — pass ``conditional=True`` for class-conditional models to
    get a clean rejection. Same trained-schedule reuse rules as
    make_sampler."""
    from dmme_tpu.diffusion.deep_cache import DeepCachedDDIM, DeepCachedDPM
    from dmme_tpu.diffusion.fast import CachedDDIM

    assert name in MODULE_SAMPLERS, name
    if conditional:
        raise ValueError(
            f"sampler={name!r} does not support class-conditional models "
            "(feature caching bypasses the CFG wrapper); use ddim or dpm"
        )
    if isinstance(base, IDDPM):
        raise ValueError(
            f"sampler={name!r} does not support variance-learning (ε‖v) "
            "models — the cached decoder consumes raw ε; use ddim or dpm "
            "(which adapt via models.eps_only)"
        )
    schedule = getattr(base, "schedule", None)
    if schedule is None:
        raise ValueError(f"sampler={name!r} needs a discrete-schedule model")
    timesteps = int(getattr(base, "timesteps"))
    par = getattr(base, "parameterization", "eps")
    # same near-zero terminal-alpha_bar guard as make_sampler (clip_x0)
    clip_x0 = bool(float(schedule.alpha_bar[-1]) < 1e-6)
    if name == "deep_dpm":
        steps = int(steps or STEP_DEFAULTS["dpm"])
        return DeepCachedDPM.create(
            timesteps, sub_timesteps=steps, schedule=schedule,
            parameterization=par, refresh_interval=refresh_interval,
            cache_depth=cache_depth,
        ).replace(clip_x0=clip_x0)
    steps = int(steps or 50)
    common = dict(
        schedule=schedule, timesteps=timesteps,
        tau=eq.ddim.quadratic_tau(timesteps, steps),
        sub_timesteps=steps, eta=0.0, variant="canonical",
        parameterization=par, refresh_interval=refresh_interval,
        clip_x0=clip_x0,
    )
    if name == "cached":
        return CachedDDIM(**common)
    return DeepCachedDDIM(**common, cache_depth=cache_depth)


def make_sampler(
    base, name: str, steps: Optional[int] = None
) -> Tuple[object, Callable]:
    """(algorithm, model_fn_adapter) for sampling a trained model with a
    different solver.

    ``base`` is the TRAINED algorithm (source of schedule, timesteps, and
    parameterization). ``name`` ∈ ddim | dpm | unipc | edm. The adapter wraps the
    model_fn (identity except for IDDPM models, whose ε‖v output is
    sliced to ε). EDM override applies only to EDM-trained models — the
    network is σ-conditioned, not t-conditioned.
    """
    if name not in STEP_DEFAULTS:
        raise ValueError(f"unknown sampler {name!r} (ddim|dpm|edm|unipc|flow)")
    steps = int(steps or STEP_DEFAULTS[name])

    def identity(fn):
        return fn

    if name == "flow":
        if not isinstance(base, FlowMatching):
            raise ValueError(
                "sampler=flow needs a flow-matching-trained model (velocity "
                "network); discrete-t models can use ddim or dpm"
            )
        # rebuild the grid at the new step count with the TRAINED
        # hyperparameters (shift, order, time_scale)
        return (
            FlowMatching.create(
                steps=steps,
                order=base.order,
                shift=base.shift,
                t_sample=base.t_sample,
                logit_mean=base.logit_mean,
                logit_std=base.logit_std,
                time_scale=base.time_scale,
            ),
            identity,
        )

    if name == "edm":
        if not isinstance(base, EDM):
            raise ValueError(
                "sampler=edm needs an EDM-trained model (σ-conditioned "
                "network); discrete-t models can use ddim or dpm"
            )
        # rebuild the grid at the new step count but with the TRAINED
        # hyperparameters — paper defaults here would mis-precondition
        # any non-default model (same failure class as rebuilding a
        # default β schedule)
        return (
            EDM.create(
                steps=steps,
                sigma_min=float(base.sigmas[-2]),
                sigma_max=float(base.sigmas[0]),
                rho=base.rho,
                sigma_data=base.sigma_data,
                p_mean=base.p_mean,
                p_std=base.p_std,
                order=base.order,
                s_churn=base.s_churn,
                s_min=base.s_min,
                s_max=base.s_max,
                s_noise=base.s_noise,
            ),
            identity,
        )

    schedule = getattr(base, "schedule", None)
    if schedule is None:
        raise ValueError(
            f"sampler={name!r} needs a discrete-schedule model; "
            f"{type(base).__name__} has none (EDM models sample with "
            "sampler=edm, flow-matching models with sampler=flow)"
        )
    timesteps = int(getattr(base, "timesteps"))
    par = getattr(base, "parameterization", "eps")

    adapter = identity
    if isinstance(base, IDDPM):
        from dmme_tpu.models import eps_only

        adapter = eps_only

    # Near-zero terminal ᾱ (cosine schedules: ᾱ_T ≈ 2e-15 vs ≈ 4e-5 for
    # the linear schedule) makes the solvers' x̂₀ division at t=T amplify
    # ε error by ~1/√ᾱ_T — measured NaN (DDIM) / noise output (DPM) on a
    # trained IDDPM. Enable the official-IDDPM clip_denoised remedy
    # exactly there, keeping bit-parity on linear schedules.
    clip_x0 = bool(float(schedule.alpha_bar[-1]) < 1e-6)

    if name == "ddim":
        algo = DDIM(
            schedule=schedule,
            timesteps=timesteps,
            tau=eq.ddim.quadratic_tau(timesteps, steps),
            sub_timesteps=steps,
            eta=0.0,
            variant="canonical",
            parameterization=par,
            clip_x0=clip_x0,
        )
    elif name == "unipc":
        algo = UniPC.create(
            timesteps,
            sub_timesteps=steps,
            schedule=schedule,
            parameterization=par,
        ).replace(clip_x0=clip_x0)
    else:  # dpm
        algo = DPMSolverPP.create(
            timesteps,
            sub_timesteps=steps,
            schedule=schedule,
            parameterization=par,
        ).replace(clip_x0=clip_x0)
    return algo, adapter
