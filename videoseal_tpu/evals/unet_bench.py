"""Per-level UNet serving-forward timing (perf tool).

Splits unet_apply_fused (kernels/unet_fused.py) into encoder / bottleneck /
decoder stages and times each with the hoist-proof chained harness, on the
flagship card's real (BN-folded) parameters at 32 key frames — the exact
serving shapes bench.py exercises.

Run: python -m videoseal_tpu.evals.unet_bench [--keys 32] [--dtype bfloat16]
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--keys", type=int, default=32)
    ap.add_argument("--card", default="videoseal_1.0")
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--s2d", type=int, default=0,
                    help="time the space-to-depth forward's stages instead")
    ap.add_argument("--s2d_pieces", type=int, default=0,
                    help="time each s2d decoder level separately")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import videoseal_tpu as vs
    from ..kernels.unet_fused import _conv, _resnet_block, _upsample
    from ..modules.common import get_activation
    from .stage_bench import time_stage, _perturb

    model = vs.load(args.card).with_dtype(args.dtype)
    u = model.embedder_spec.module.unet
    mults = tuple(u["z_channels_mults"])
    num_blocks = u.get("num_blocks", 8)
    normalization = u.get("normalization", "batch")
    act = get_activation(u.get("activation", "relu"))
    hidden = model.embedder_spec.module.hidden_size
    p = model.embedder_vars["params"]["unet"]
    s = model.embedder_vars.get("batch_stats", {}).get("unet", {})
    n_levels = len(mults)
    sdim = model.cfg.img_size
    K = args.keys
    cdtype = jnp.dtype(args.dtype)

    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.uniform(-1, 1, (K, sdim, sdim, 1)), cdtype)

    if args.s2d_pieces:
        _s2d_decoder_pieces(p, s, mults, num_blocks, normalization, act,
                            hidden, sdim, K, x0, rng, cdtype, args.k)
        return
    if args.s2d:
        _s2d_stages(p, s, mults, num_blocks, normalization, act, hidden,
                    sdim, K, x0, rng, cdtype, args.k)
        return

    def encoder(x, eps):
        x = _perturb(x, eps)
        x = _resnet_block(x, p["inc"], s.get("inc", {}), normalization, act)
        hiddens = [x]
        for i in range(n_levels - 1):
            d = p[f"downs_{i}"]
            ds = s.get(f"downs_{i}", {})
            y = _conv(hiddens[-1], d["down"]["kernel"], d["down"]["bias"],
                      stride=2)
            y = _resnet_block(y, d["conv"], ds.get("conv", {}), normalization,
                              act)
            hiddens.append(y)
        return hiddens

    hiddens = jax.jit(lambda x: encoder(x, jnp.float32(0.0)))(x0)
    lat = hiddens[-1]

    emb = jnp.asarray(rng.normal(0, 1, (K, hidden)), cdtype)

    def _pre(lat_, emb_):
        emb_map = jnp.broadcast_to(emb_[:, None, None, :],
                                   lat_.shape[:-1] + (hidden,))
        return jnp.concatenate([lat_, emb_map], axis=-1)

    def bottleneck(args_, eps):
        lat_, emb_ = args_
        y = _perturb(_pre(lat_, emb_), eps)
        for j in range(num_blocks):
            y = _resnet_block(y, p[f"bottleneck_{j}"],
                              s.get(f"bottleneck_{j}", {}), normalization, act)
        return y

    y_pre = jax.jit(_pre)(lat, emb)
    y0 = jax.jit(lambda a: bottleneck(a, jnp.float32(0.0)))((lat, emb))

    def decoder(args_, eps):
        y, hs = args_
        y = _perturb(y, eps)
        scale = 2 ** -0.5
        hs = list(hs)
        for i in range(n_levels - 1):
            y = jnp.concatenate([y, hs.pop() * scale], axis=-1)
            up = p[f"ups_{i}"]
            us = s.get(f"ups_{i}", {})
            y = _upsample(y, up["up"], act)
            y = _resnet_block(y, up["conv"], us.get("conv", {}), normalization,
                              act)
        y = _conv(y, p["outc"]["kernel"], p["outc"]["bias"], padding=0)
        return jnp.tanh(y)

    for name, fn, a in (
            ("encoder", encoder, x0),
            ("bottleneck", bottleneck, (lat, emb)),
            ("decoder", decoder, (y0, hiddens[:-1] + [y_pre])),
    ):
        dt = time_stage(fn, a, args.k)
        print(json.dumps({"stage": name, "ms": round(dt * 1e3, 2),
                          "per_key_us": round(dt * 1e6 / K, 1)}), flush=True)


def _s2d_stages(p, st, mults, num_blocks, normalization, act, hidden,
                sdim, K, x0, rng, cdtype, kk):
    """Per-stage timing of the s2d forward (kernels/unet_s2d.py)."""
    import json

    import jax
    import jax.numpy as jnp
    from ..kernels.unet_s2d import (_block_s2d, _upsample_s2d_composed, cat_s2d,
                                    conv_s2d, d2s, s2d, s2d_schedule)
    from .stage_bench import time_stage, _perturb

    n_levels = len(mults)
    z = p["inc"]["conv2"]["conv"]["kernel"].shape[-1]
    sch = list(s2d_schedule(sdim, z, mults))
    for i in range(n_levels - 2, -1, -1):
        sch[i] = min(sch[i], 2 * sch[i + 1])
    sch = tuple(sch)
    print(json.dumps({"schedule": sch}), flush=True)

    def encoder(x, eps):
        x = _perturb(x, eps)
        x = s2d(x * 2 - 1, sch[0])
        x = _block_s2d(x, p["inc"], st.get("inc", {}), normalization, act,
                       sch[0])
        hiddens = [x]
        for i in range(n_levels - 1):
            d = p[f"downs_{i}"]
            ds = st.get(f"downs_{i}", {})
            y = conv_s2d(hiddens[-1], d["down"]["kernel"], d["down"]["bias"],
                         conv_stride=2, s_in=sch[i], s_out=sch[i + 1])
            y = _block_s2d(y, d["conv"], ds.get("conv", {}), normalization,
                           act, sch[i + 1])
            hiddens.append(y)
        return hiddens

    hiddens = jax.jit(lambda x: encoder(x, jnp.float32(0.0)))(x0)
    lat = hiddens[-1]
    emb = jnp.asarray(rng.normal(0, 1, (K, hidden)), cdtype)
    s_bot = sch[-1]

    def _pre(lat_, emb_):
        emb_map = jnp.broadcast_to(
            emb_[:, None, None, :].astype(lat_.dtype),
            lat_.shape[:-1] + (hidden,))
        if s_bot > 1:
            emb_map = jnp.tile(emb_map, (1, 1, 1, s_bot * s_bot))
        return cat_s2d(lat_, emb_map, s_bot)

    def bottleneck(args_, eps):
        lat_, emb_ = args_
        y = _perturb(_pre(lat_, emb_), eps)
        for j in range(num_blocks):
            y = _block_s2d(y, p[f"bottleneck_{j}"],
                           st.get(f"bottleneck_{j}", {}), normalization, act,
                           s_bot)
        return y

    y_pre = jax.jit(_pre)(lat, emb)
    y0 = jax.jit(lambda a: bottleneck(a, jnp.float32(0.0)))((lat, emb))

    def decoder(args_, eps):
        y, hs = args_
        y = _perturb(y, eps)
        hs = list(hs)
        scale = 2 ** -0.5
        levels = list(sch)
        for i in range(n_levels - 1):
            s_cur = levels[n_levels - 1 - i]
            s_next = levels[n_levels - 2 - i]
            y = cat_s2d(y, hs.pop() * scale, s_cur)
            u = p[f"ups_{i}"]
            us = st.get(f"ups_{i}", {})
            y = _upsample_s2d_composed(y, u["up"], act, s_cur, s_next)
            y = _block_s2d(y, u["conv"], us.get("conv", {}), normalization,
                           act, s_next)
        y = conv_s2d(y, p["outc"]["kernel"], p["outc"]["bias"],
                     s_in=sch[0], s_out=sch[0])
        return jnp.tanh(d2s(y, sch[0]))

    for name, fn, a in (
            ("s2d_encoder", encoder, x0),
            ("s2d_bottleneck", bottleneck, (lat, emb)),
            ("s2d_decoder", decoder, (y0, hiddens[:-1] + [y_pre])),
    ):
        dt = time_stage(fn, a, kk)
        print(json.dumps({"stage": name, "ms": round(dt * 1e3, 2),
                          "per_key_us": round(dt * 1e6 / K, 1)}), flush=True)




def _s2d_decoder_pieces(p, st, mults, num_blocks, normalization, act, hidden,
                        sdim, K, x0, rng, cdtype, kk):
    """Break the s2d decoder into per-level pieces."""
    import json

    import jax
    import jax.numpy as jnp
    from ..kernels.unet_s2d import (_block_s2d, _upsample_s2d_composed, cat_s2d,
                                    conv_s2d, d2s, s2d, s2d_schedule)
    from .stage_bench import time_stage, _perturb

    n_levels = len(mults)
    z = p["inc"]["conv2"]["conv"]["kernel"].shape[-1]
    sch = list(s2d_schedule(sdim, z, mults))
    for i in range(n_levels - 2, -1, -1):
        sch[i] = min(sch[i], 2 * sch[i + 1])
    sch = tuple(sch)

    # build real intermediates
    def enc(x):
        x = s2d(x * 2 - 1, sch[0])
        x = _block_s2d(x, p["inc"], st.get("inc", {}), normalization, act,
                       sch[0])
        hiddens = [x]
        for i in range(n_levels - 1):
            d = p[f"downs_{i}"]
            y = conv_s2d(hiddens[-1], d["down"]["kernel"], d["down"]["bias"],
                         conv_stride=2, s_in=sch[i], s_out=sch[i + 1])
            y = _block_s2d(y, d["conv"], st.get(f"downs_{i}", {}).get("conv", {}),
                           normalization, act, sch[i + 1])
            hiddens.append(y)
        return hiddens

    hiddens = jax.jit(enc)(x0)
    emb = jnp.asarray(rng.normal(0, 1, (K, hidden)), cdtype)
    lat = hiddens[-1]
    s_bot = sch[-1]
    emb_map = jnp.broadcast_to(emb[:, None, None, :].astype(lat.dtype),
                               lat.shape[:-1] + (hidden,))
    y = jax.jit(lambda a, b: cat_s2d(a, b, s_bot))(lat, emb_map)
    for j in range(num_blocks):
        y = jax.jit(lambda v, jj=j: _block_s2d(
            v, p[f"bottleneck_{jj}"], st.get(f"bottleneck_{jj}", {}),
            normalization, act, s_bot))(y)

    scale = 2 ** -0.5
    cur = y
    for i in range(n_levels - 1):
        s_cur = sch[n_levels - 1 - i]
        s_next = sch[n_levels - 2 - i]
        skip = hiddens[n_levels - 1 - i - 1] if i > 0 else hiddens[-1]
        # NOTE: mirrors decoder pops: first pop is the bottleneck-level
        # pre-concat — approximate with lat||emb tensor for shape parity
        skip_t = (cat_s2d(lat, emb_map, s_bot) if i == 0
                  else hiddens[n_levels - 1 - i])

        def level(args_, eps, i=i, s_cur=s_cur, s_next=s_next):
            yy, sk = args_
            yy = _perturb(yy, eps)
            yy = cat_s2d(yy, sk * scale, s_cur)
            u = p[f"ups_{i}"]
            us = st.get(f"ups_{i}", {})
            yy = _upsample_s2d_composed(yy, u["up"], act, s_cur, s_next)
            return _block_s2d(yy, u["conv"], us.get("conv", {}), normalization,
                              act, s_next)

        dt = time_stage(level, (cur, skip_t), kk)
        print(json.dumps({"stage": f"s2d_up{i}", "ms": round(dt * 1e3, 2)}),
              flush=True)
        cur = jax.jit(lambda a: level(a, jnp.float32(0.0)))((cur, skip_t))

    def outc(v, eps):
        v = _perturb(v, eps)
        v = conv_s2d(v, p["outc"]["kernel"], p["outc"]["bias"],
                     s_in=sch[0], s_out=sch[0])
        return jnp.tanh(d2s(v, sch[0]))

    dt = time_stage(outc, cur, kk)
    print(json.dumps({"stage": "s2d_outc", "ms": round(dt * 1e3, 2)}),
          flush=True)


if __name__ == "__main__":
    main()
