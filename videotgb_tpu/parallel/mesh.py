"""Device-mesh construction — the TPU replacement for Lightning's DDP strategies.

The reference scales with NCCL data-parallel only (reference:
configs/trainer/ddp.yaml:4, SURVEY.md section 2.7). On TPU the idiomatic
equivalent is a named :class:`jax.sharding.Mesh` over which pjit/GSPMD places
XLA collectives on the ICI fabric. We expose three axes:

  dp    — data parallel (batch sharding; grad all-reduce rides psum)
  fsdp  — parameter sharding for the 7B decoder (ZeRO-3-style, all-gather on use)
  tp    — tensor parallel (attention heads / MLP hidden sharded)
  pp    — pipeline parallel (scanned-tower layer stages; parallel.pipeline
          streams microbatches between neighbours with ppermute)
  sp    — sequence parallel (Megatron-SP style: the transformer residual
          stream is token-sharded between layers via constrain_batch; GSPMD
          inserts the all-gather into attention and the reduce-scatter out
          of it). Optional headroom beyond the reference (SURVEY.md §5.7).

Axis sizes multiply to the device count. The default recipe parity layout is
pure-dp (the reference trains DDPx4); inference of Vicuna-7B uses dp x tp.
"""

from __future__ import annotations

import dataclasses
import math
import os

import jax
import numpy as np
from jax.sharding import Mesh

DATA_AXIS = "dp"
FSDP_AXIS = "fsdp"
TENSOR_AXIS = "tp"
PIPELINE_AXIS = "pp"
SEQUENCE_AXIS = "sp"
AXIS_NAMES = (DATA_AXIS, FSDP_AXIS, TENSOR_AXIS, PIPELINE_AXIS, SEQUENCE_AXIS)


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Mesh axis sizes; -1 means "absorb remaining devices" (like np.reshape)."""

    dp: int = -1
    fsdp: int = 1
    tp: int = 1
    pp: int = 1
    sp: int = 1

    def resolve(self, n_devices: int) -> tuple[int, int, int, int, int]:
        sizes = [self.dp, self.fsdp, self.tp, self.pp, self.sp]
        wildcard = [i for i, s in enumerate(sizes) if s == -1]
        if len(wildcard) > 1:
            raise ValueError("at most one mesh axis may be -1")
        known = math.prod(s for s in sizes if s != -1)
        if wildcard:
            if n_devices % known:
                raise ValueError(
                    f"{n_devices} devices not divisible by fixed axes {sizes}"
                )
            sizes[wildcard[0]] = n_devices // known
        if math.prod(sizes) != n_devices:
            raise ValueError(f"mesh {sizes} != device count {n_devices}")
        return tuple(sizes)  # type: ignore[return-value]


def parse_mesh_spec(spec: str, allow_pp: bool = True) -> MeshConfig:
    """Parse a CLI mesh string like ``"dp=2,tp=4"`` into a :class:`MeshConfig`.

    Unknown axis names (typos like ``ps=2``) raise instead of silently
    producing a default mesh. ``allow_pp=False`` rejects ``pp`` with a clear
    message for entry points that have no pipeline schedule (serving /
    batch inference shard with dp/fsdp/tp/sp only; pp lives in the trainer,
    parallel/pipeline.py).
    """
    kv: dict[str, int] = {}
    for part in spec.split(","):
        part = part.strip()
        if not part:
            continue
        if "=" not in part:
            raise ValueError(
                f"bad mesh spec item {part!r} (expected axis=size, "
                f"e.g. 'dp=2,tp=4')")
        k, _, v = part.partition("=")
        k = k.strip()
        if k not in AXIS_NAMES:
            raise ValueError(
                f"unknown mesh axis {k!r}; valid axes: {', '.join(AXIS_NAMES)}")
        if k == PIPELINE_AXIS and not allow_pp:
            raise ValueError(
                "pp (pipeline parallel) is only available in the trainer "
                "(parallel/pipeline.py); shard serving/inference with "
                "dp/fsdp/tp/sp")
        try:
            kv[k] = int(v)
        except ValueError:
            raise ValueError(f"mesh axis size must be an int: {part!r}") from None
    return MeshConfig(**{**{"dp": 1}, **kv})


def create_mesh(
    config: MeshConfig | None = None,
    devices: list | None = None,
) -> Mesh:
    """Build a (dp, fsdp, tp, pp) mesh over the given (default: all) devices.

    Device order matters for ICI locality: jax.devices() enumerates in
    torus-contiguous order, and we keep tp innermost so tensor-parallel
    collectives (highest traffic) ride nearest-neighbor links.
    """
    config = config or MeshConfig()
    devices = devices if devices is not None else jax.devices()
    if -1 not in (config.dp, config.fsdp, config.tp, config.pp, config.sp):
        # fully specified layout: use the first dp*fsdp*tp*pp*sp devices (e.g.
        # the single-device debug trainer on a multi-device host)
        want = config.dp * config.fsdp * config.tp * config.pp * config.sp
        if want <= len(devices):
            devices = devices[:want]
    shape = config.resolve(len(devices))
    device_array = np.asarray(devices).reshape(shape)
    return Mesh(device_array, AXIS_NAMES)


def local_mesh(n: int | None = None, **axis_sizes: int) -> Mesh:
    """A mesh over the first ``n`` local devices (tests / single-host runs)."""
    devices = jax.devices()[: n or len(jax.devices())]
    cfg = MeshConfig(**axis_sizes) if axis_sizes else MeshConfig()
    return create_mesh(cfg, devices)


def host_cpu_mesh_env(n_devices: int = 8) -> dict[str, str]:
    """Env vars that simulate an ``n_devices`` CPU mesh (the reference's
    ddp_sim analogue, configs/trainer/ddp_sim.yaml)."""
    return {
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={n_devices}"
        ).strip(),
    }
