"""RAFT BasicEncoder segment probe at bench shapes (v5e-1).

Bench workload: 64 clips x 4 flow pairs -> fnet batch 512 images @ 224^2
(bf16 serving dtype), cnet batch 256. Measures:

  * full fnet / cnet at bench shapes;
  * per-stage timings (stem / layer1 / layer2 / layer3 / head);
  * InstanceNorm variants: current two-pass mean/var vs single-pass
    E[x^2]-E[x]^2 (one fused read instead of two sequential reductions);
  * stem variants: direct 7x7/s2 conv vs space-to-depth (2x2 -> 12ch, 4x4/s1
    conv with the zero-padded rearranged kernel — exact same math).

Usage: python tools/raftencprobe.py [--fnet 512] [--cnet 256]
"""

from __future__ import annotations

import argparse
import statistics
import time

import numpy as np


def timed(fn, *args, iters=5):
    """fn must return a SCALAR (host fetch is the only sync on this backend,
    and the tunnel is ~35 MB/s — fetching real outputs would swamp timing)."""
    _ = float(fn(*args))
    ts = []
    for _i in range(iters):
        t0 = time.perf_counter()
        _ = float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts)


def report(name, sec, extra=None):
    line = f"{name:28s} {sec*1000:9.2f} ms"
    if extra:
        line += "  " + " ".join(f"{k}={v}" for k, v in extra.items())
    print(line, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fnet", type=int, default=512)
    ap.add_argument("--cnet", type=int, default=256)
    ap.add_argument("--res", type=int, default=224)
    ap.add_argument("--only", default="all",
                    help="comma list of: full,norm,stem,prefix")
    args = ap.parse_args()
    only = set(args.only.split(","))

    def want(sec):
        return "all" in only or sec in only

    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from videotgb_tpu.models.raft import BasicEncoder, InstanceNorm, _conv

    key = jax.random.key(0)
    dt = jnp.bfloat16
    B, R = args.fnet, args.res
    img = jax.random.uniform(key, (B, R, R, 3), jnp.float32) * 2.0 - 1.0

    # ---- full encoders at serving dtype
    if want("full"):
        enc = BasicEncoder(256, "instance", dtype=dt)
        ep = jax.jit(enc.init)(key, img[:1])
        efn = jax.jit(
            lambda p, a: jnp.sum(enc.apply(p, a).astype(jnp.float32)))
        sec = timed(lambda a: efn(ep, a), img)
        report("fnet_instance_b%d" % B, sec)

        encb = BasicEncoder(256, "batch", dtype=dt)
        ebp = jax.jit(encb.init)(key, img[:1])
        ebfn = jax.jit(
            lambda p, a: jnp.sum(encb.apply(p, a).astype(jnp.float32)))
        imgc = img[: args.cnet]
        sec = timed(lambda a: ebfn(ebp, a), imgc)
        report("cnet_batch_b%d" % args.cnet, sec)

    # ---- InstanceNorm variants at the stage-1 shape (B, 112, 112, 64)
    x1 = jax.random.normal(key, (B, R // 2, R // 2, 64), dt)
    if not want("norm"):
        x1 = None

    def inorm_twopass(x):
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=(1, 2), keepdims=True)
        var = jnp.var(x32, axis=(1, 2), keepdims=True)
        return ((x32 - mean) * jax.lax.rsqrt(var + 1e-5)).astype(x.dtype)

    def inorm_onepass(x):
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=(1, 2), keepdims=True)
        meansq = jnp.mean(jnp.square(x32), axis=(1, 2), keepdims=True)
        var = jnp.maximum(meansq - jnp.square(mean), 0.0)
        return ((x32 - mean) * jax.lax.rsqrt(var + 1e-5)).astype(x.dtype)

    for name, f in (() if x1 is None else
                    (("inorm_twopass", inorm_twopass),
                     ("inorm_onepass", inorm_onepass))):
        jf = jax.jit(lambda a, f=f: jnp.sum(f(a).astype(jnp.float32)))
        sec = timed(lambda a, jf=jf: jf(a), x1)
        report(name + "_112", sec)
    if x1 is not None:
        d = float(jax.jit(lambda a: jnp.max(jnp.abs(
            inorm_onepass(a).astype(jnp.float32)
            - inorm_twopass(a).astype(jnp.float32))))(x1))
        report("inorm_maxdiff", 0.0, {"max_abs": f"{d:.2e}"})

    # ---- stem variants
    if not want("stem"):
        return
    stem = _conv(64, 7, 2, dtype=dt)
    sp = jax.jit(stem.init)(key, img[:1])
    sfn = jax.jit(
        lambda p, a: jnp.sum(stem.apply(p, a.astype(dt)).astype(jnp.float32)))
    sraw = jax.jit(lambda p, a: stem.apply(p, a.astype(dt)))
    sec = timed(lambda a: sfn(sp, a), img)
    report("stem_7x7s2_direct", sec)

    # space-to-depth: exact rewrite. 7x7/s2 pad3 conv == pad the image by
    # (3,3) per side (length H+6, even), s2d 2x2 -> 12ch, then VALID 4x4/s1
    # conv whose kernel is the 7x7 zero-padded to 8x8 and rearranged:
    # out[y] = sum_{dy=2a+p} w8[2a+p] * inP[2(y+a)+p] = sum_a ws2d[a] * s[y+a].
    w = sp["params"]["kernel"].astype(dt)  # (7,7,3,64)
    b_ = sp["params"]["bias"].astype(dt)
    w8 = jnp.pad(w, ((0, 1), (0, 1), (0, 0), (0, 0)))  # (8,8,3,64)
    # out(y,x) = sum_{dy,dx} w[dy,dx] * in[2y+dy-3, 2x+dx-3]
    # with s2d grid aligned at offset -4 (pad 4 left): in[2(y-? )...]
    # kernel rearrange: w8[2a+p, 2b+q] -> ws2d[a, b, (p,q,c)]
    ws2d = w8.reshape(4, 2, 4, 2, 3, 64).transpose(0, 2, 1, 3, 4, 5)
    ws2d = ws2d.reshape(4, 4, 12, 64)

    def stem_s2d(a):
        a = a.astype(dt)
        ap = jnp.pad(a, ((0, 0), (3, 3), (3, 3), (0, 0)))
        Bq, H, W, C = ap.shape
        s = ap.reshape(Bq, H // 2, 2, W // 2, 2, C).transpose(0, 1, 3, 2, 4, 5)
        s = s.reshape(Bq, H // 2, W // 2, 4 * C)
        out = jax.lax.conv_general_dilated(
            s, ws2d, window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return out + b_
    jsfn = jax.jit(lambda a: jnp.sum(stem_s2d(a).astype(jnp.float32)))
    sec = timed(lambda a: jsfn(a), img)
    d = float(jax.jit(lambda a: jnp.max(jnp.abs(
        stem_s2d(a).astype(jnp.float32)
        - sraw(sp, a).astype(jnp.float32))))(img[:2]))
    report("stem_s2d", sec, {"max_abs": f"{d:.2e}"})

    # ---- per-stage attribution: time cumulative prefixes of the real fnet
    if not want("prefix"):
        return
    class Prefix(nn.Module):
        upto: int

        @nn.compact
        def __call__(self, xx):
            from videotgb_tpu.models.raft import ResidualBlock, _Norm
            xx = _conv(64, 7, 2, name="conv1", dtype=dt)(xx.astype(dt))
            xx = _Norm("instance", 64, name="norm1")(xx)
            xx = nn.relu(xx)
            cnt = 0
            for i, (dim, stride) in enumerate([(64, 1), (96, 2), (128, 2)]):
                if cnt >= self.upto:
                    return xx
                xx = ResidualBlock(dim, "instance", stride, dtype=dt,
                                   name=f"layer{i+1}_0")(xx)
                xx = ResidualBlock(dim, "instance", 1, dtype=dt,
                                   name=f"layer{i+1}_1")(xx)
                cnt += 1
            if self.upto >= 4:
                xx = nn.Conv(256, (1, 1), dtype=dt, name="conv2")(xx)
            return xx

    prev = 0.0
    names = ["stem", "layer1", "layer2", "layer3", "head"]
    for upto in range(5):
        m = Prefix(upto)
        p = jax.jit(m.init)(key, img[:1])
        f = jax.jit(
            lambda pp, a, m=m: jnp.sum(m.apply(pp, a).astype(jnp.float32)))
        sec = timed(lambda a, f=f, p=p: f(p, a), img)
        report(f"prefix_{names[upto]}", sec,
               {"delta_ms": round((sec - prev) * 1000, 2)})
        prev = sec


if __name__ == "__main__":
    main()
