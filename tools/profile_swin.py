"""Ablation microbenchmark of one stage-1 Swin-L block at 800x800 input
scale (feature map 200x200x192, window 12). Temporary diagnostic."""

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

H = W = 200
C = 192
HEADS = 6
WS = 12
B = 1

rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
qkv_w = jnp.asarray(rng.standard_normal((3, C, C)) * 0.02, jnp.float32)
out_w = jnp.asarray(rng.standard_normal((C, C)) * 0.02, jnp.float32)
mlp1_w = jnp.asarray(rng.standard_normal((C, 4 * C)) * 0.02, jnp.float32)
mlp2_w = jnp.asarray(rng.standard_normal((4 * C, C)) * 0.02, jnp.float32)
bias_table = jnp.asarray(rng.standard_normal(((2 * WS - 1) ** 2, HEADS)), jnp.float32)

from weed_instance_segmentation_tpu.models.swin import (
    relative_position_index, shifted_window_attn_mask, window_partition, window_reverse,
)

REL_IDX = relative_position_index(WS).reshape(-1)


def block(x, *, use_bias_gather, use_mask, use_gelu_exact, use_roll, pad):
    b, h, w, c = x.shape
    if pad:
        pb = (WS - h % WS) % WS
        pr = (WS - w % WS) % WS
        x = jnp.pad(x, ((0, 0), (0, pb), (0, pr), (0, 0)))
    hp, wp = x.shape[1:3]
    if use_roll:
        x = jnp.roll(x, shift=(-6, -6), axis=(1, 2))
    win = window_partition(x, WS)  # (nw, 144, C)
    nw, t, _ = win.shape
    q = win @ qkv_w[0]
    k = win @ qkv_w[1]
    v = win @ qkv_w[2]
    hd = c // HEADS

    def split(tt):
        return tt.reshape(nw, t, HEADS, hd).transpose(0, 2, 1, 3)

    q, k, v = split(q), split(k), split(v)
    scores = jnp.einsum('whqd,whkd->whqk', q, k) / np.sqrt(hd)
    if use_bias_gather:
        rel = bias_table[REL_IDX].reshape(t, t, HEADS).transpose(2, 0, 1)
        scores = scores + rel[None]
    if use_mask:
        am = shifted_window_attn_mask(hp, wp, WS, 6)
        scores = scores.reshape(-1, am.shape[0], HEADS, t, t) + jnp.asarray(am)[None, :, None]
        scores = scores.reshape(-1, HEADS, t, t)
    probs = jax.nn.softmax(scores, axis=-1)
    o = jnp.einsum('whqk,whkd->whqd', probs, v)
    o = o.transpose(0, 2, 1, 3).reshape(nw, t, c) @ out_w
    x = window_reverse(o, WS, hp, wp)
    if use_roll:
        x = jnp.roll(x, shift=(6, 6), axis=(1, 2))
    if pad:
        x = x[:, :h, :w]
    y = x @ mlp1_w
    y = jax.nn.gelu(y, approximate=not use_gelu_exact)
    y = y @ mlp2_w
    return x + y


def timeit(name, fn, iters=5):
    f = jax.jit(fn)
    out = f(x)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    d = jnp.float32(0.0)
    for _ in range(iters):
        out = f(x + d * 0)
        d = out.reshape(-1)[0] * 1e-20
    float(d)
    dt = (time.perf_counter() - t0) / iters
    print(f'{name}: {dt * 1000:.1f} ms', flush=True)


full = partial(block, use_bias_gather=True, use_mask=True, use_gelu_exact=True,
               use_roll=True, pad=True)
timeit('full block', full)
timeit('no bias gather', partial(block, use_bias_gather=False, use_mask=True,
                                 use_gelu_exact=True, use_roll=True, pad=True))
timeit('no mask', partial(block, use_bias_gather=True, use_mask=False,
                          use_gelu_exact=True, use_roll=True, pad=True))
timeit('tanh gelu', partial(block, use_bias_gather=True, use_mask=True,
                            use_gelu_exact=False, use_roll=True, pad=True))
timeit('no roll', partial(block, use_bias_gather=True, use_mask=True,
                          use_gelu_exact=True, use_roll=False, pad=True))
timeit('bare (none)', partial(block, use_bias_gather=False, use_mask=False,
                              use_gelu_exact=False, use_roll=False, pad=True))


def block_barrier(x):
    b, h, w, c = x.shape
    pb = (WS - h % WS) % WS
    pr = (WS - w % WS) % WS
    x = jnp.pad(x, ((0, 0), (0, pb), (0, pr), (0, 0)))
    hp, wp = x.shape[1:3]
    x = jnp.roll(x, shift=(-6, -6), axis=(1, 2))
    win = window_partition(x, WS)
    nw, t, _ = win.shape
    q, k, v = win @ qkv_w[0], win @ qkv_w[1], win @ qkv_w[2]
    hd = c // HEADS

    def split(tt):
        return tt.reshape(nw, t, HEADS, hd).transpose(0, 2, 1, 3)

    q, k, v = split(q), split(k), split(v)
    scores = jnp.einsum('whqd,whkd->whqk', q, k) / np.sqrt(hd)
    rel = bias_table[REL_IDX].reshape(t, t, HEADS).transpose(2, 0, 1)
    rel = jax.lax.optimization_barrier(rel)  # materialize: no gather-in-fusion dup
    scores = scores + rel[None]
    am = shifted_window_attn_mask(hp, wp, WS, 6)
    scores = scores.reshape(-1, am.shape[0], HEADS, t, t) + jnp.asarray(am)[None, :, None]
    scores = scores.reshape(-1, HEADS, t, t)
    probs = jax.nn.softmax(scores, axis=-1)
    o = jnp.einsum('whqk,whkd->whqd', probs, v)
    o = o.transpose(0, 2, 1, 3).reshape(nw, t, c) @ out_w
    x = window_reverse(o, WS, hp, wp)
    x = jnp.roll(x, shift=(6, 6), axis=(1, 2))
    x = x[:, :h, :w]
    y = x @ mlp1_w
    y = jax.nn.gelu(y, approximate=False)
    y = y @ mlp2_w
    return x + y


timeit('full + barrier', block_barrier)
