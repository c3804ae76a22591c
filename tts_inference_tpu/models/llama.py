"""Llama-3.2-style causal decoder (the Orpheus-3B body) in pure JAX.

The reference consumes this model through third-party engines (TRT-LLM
`build_engine.py:141-150`, vLLM `modal_audio_stream.py:217-232`, HF eager in
`helpers/compare_snac.py:236-246`). This is the first-party TPU-native
implementation: pure functions over a params pytree, feature-last matmuls
(`x @ w`, MXU-friendly), fp32 softmax/normalization islands inside a bf16
graph, and a dense slotted KV cache with per-slot lengths designed for
continuous batching and pjit TP sharding (heads axis shardable).

Checkpoint import: `loader.llama_params_from_hf_state` (HF safetensors →
this pytree, LoRA merged in weight space).
"""

from __future__ import annotations

import math
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tts_inference_tpu.config import ModelConfig
from tts_inference_tpu.models.quant import embed_rows, head_logits, mm, tied_logits

Params = Dict


def param_dtype(cfg: ModelConfig):
    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32,
            "float16": jnp.float16}[cfg.dtype]


# ---------------------------------------------------------------------------
# Init (random weights; HF import lives in loader.py)
# ---------------------------------------------------------------------------


def init_llama_params(key: jax.Array, cfg: ModelConfig) -> Params:
    dt = param_dtype(cfg)
    h, ffn = cfg.hidden_size, cfg.intermediate_size
    hd, nq, nkv = cfg.head_dim, cfg.num_attention_heads, cfg.num_key_value_heads

    def dense(k, shape):
        scale = 1.0 / math.sqrt(shape[0])
        return (jax.random.normal(k, shape, jnp.float32) * scale).astype(dt)

    keys = jax.random.split(key, cfg.num_hidden_layers + 3)
    layers = []
    for i in range(cfg.num_hidden_layers):
        ks = jax.random.split(keys[i], 7)
        layers.append(
            {
                "input_norm": jnp.ones((h,), dt),
                "post_attn_norm": jnp.ones((h,), dt),
                "wq": dense(ks[0], (h, nq * hd)),
                "wk": dense(ks[1], (h, nkv * hd)),
                "wv": dense(ks[2], (h, nkv * hd)),
                "wo": dense(ks[3], (nq * hd, h)),
                "w_gate": dense(ks[4], (h, ffn)),
                "w_up": dense(ks[5], (h, ffn)),
                "w_down": dense(ks[6], (ffn, h)),
            }
        )
    p = {
        "embed": (jax.random.normal(keys[-3], (cfg.vocab_size, h), jnp.float32)
                  * 0.02).astype(dt),
        "final_norm": jnp.ones((h,), dt),
        "layers": layers,
    }
    if not cfg.tie_word_embeddings:
        p["lm_head"] = dense(keys[-2], (h, cfg.vocab_size))
    return p


# ---------------------------------------------------------------------------
# Building blocks
# ---------------------------------------------------------------------------


def rms_norm(x: jnp.ndarray, w: jnp.ndarray, eps: float) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    out = xf * jax.lax.rsqrt(var + eps)
    return (out * w.astype(jnp.float32)).astype(x.dtype)


def rope_inv_freq(cfg: ModelConfig) -> np.ndarray:
    """Inverse frequencies, with HF "llama3" rope scaling when configured."""
    d = cfg.head_dim
    inv = 1.0 / (cfg.rope_theta ** (np.arange(0, d, 2, dtype=np.float64) / d))
    if cfg.rope_scaling_factor is None:
        return inv.astype(np.float32)
    factor = cfg.rope_scaling_factor
    lo_f, hi_f = cfg.rope_low_freq_factor, cfg.rope_high_freq_factor
    orig = cfg.rope_original_max_position
    low_wl = orig / lo_f
    high_wl = orig / hi_f
    wavelen = 2 * np.pi / inv
    scaled = np.where(wavelen > low_wl, inv / factor, inv)
    smooth = (orig / wavelen - lo_f) / (hi_f - lo_f)
    mid = (1 - smooth) * inv / factor + smooth * inv
    is_mid = (wavelen >= high_wl) & (wavelen <= low_wl)
    return np.where(is_mid, mid, scaled).astype(np.float32)


def rope_tables(
    cfg: ModelConfig, positions: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """positions (…,) int32 → cos/sin tables (…, head_dim/2) fp32."""
    inv = jnp.asarray(rope_inv_freq(cfg))
    ang = positions.astype(jnp.float32)[..., None] * inv
    return jnp.cos(ang), jnp.sin(ang)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """Rotate pairs (HF convention: halves, not interleaved).

    x: (B, S, H, D); cos/sin: (B, S, D/2) → broadcast over heads.
    """
    d2 = x.shape[-1] // 2
    x1, x2 = x[..., :d2], x[..., d2:]
    c = cos[:, :, None, :].astype(jnp.float32)
    s = sin[:, :, None, :].astype(jnp.float32)
    x1f, x2f = x1.astype(jnp.float32), x2.astype(jnp.float32)
    out = jnp.concatenate([x1f * c - x2f * s, x2f * c + x1f * s], axis=-1)
    return out.astype(x.dtype)


class KVCache(NamedTuple):
    """Dense slotted KV cache.

    k/v: per-layer tuples of (batch, max_seq, kv_heads, head_dim) arrays —
    SEPARATE pytree leaves on purpose: a single stacked (L, …) array forces
    jnp.stack(new_layers) every forward, i.e. a full-cache copy per decoded
    token (measured ~1–10 ms/token of pure HBM copy). Per-layer leaves let
    XLA update each layer's buffer in place through jit donation and scan
    carries. batch is the continuous-batching slot axis; kv_heads shardable
    over TP. lengths: (batch,) int32 — tokens currently valid per slot.

    int8 mode (EngineConfig.kv_cache_int8): k/v are int8 with per-(slot,
    position, head) fp32 scales in k_scale/v_scale — halves cache memory
    (2× slot capacity) and attention-read bandwidth; dequant fuses into the
    attention dots. Empty scale tuples mean full-precision mode.
    """

    k: tuple
    v: tuple
    lengths: jnp.ndarray
    k_scale: tuple = ()
    v_scale: tuple = ()

    @property
    def max_seq(self) -> int:
        return self.k[0].shape[1]

    @property
    def quantized(self) -> bool:
        return len(self.k_scale) > 0


class PagedKVCache(NamedTuple):
    """Paged/blocked KV cache (the TPU analog of TRT-LLM's paged KV,
    `tensorrt_tts/PIPELINE_REPORT.md:58-64` — 32-tok/block there).

    k/v: per-layer tuples of HEAD-BATCHED (num_blocks, Hkv, block_size, D)
    POOL arrays shared by all slots (heads on axis 1 so the Pallas kernels
    issue ONE batched dot per block instead of a launch per head — the
    launch-per-head layout measured ~2.5× slower, tools/kv_kernel_bench);
    block_table: (B, max_blocks_per_slot) int32 maps a slot's logical
    block index to a pool row. Block 0 is the TRASH block — never
    allocated, the write target for masked slots and out-of-range
    positions (unallocated table entries are 0, so overruns land there
    harmlessly and are never attended: reads are masked by position).

    HBM cost scales with tokens actually reserved, not B×max_seq — the
    dense cache's 32-slot × 4.6k-seq wall becomes a per-request budget
    (prompt + max_tokens), so 64+ heterogeneous slots fit one chip.

    int8 mode: int8 pools + per-(block, head, position) fp32 scale pools,
    (num_blocks, Hkv, block_size) — positions minor (a heads-minor layout
    tile-pads 8→128 lanes in HBM; the padded scale DMA measured costlier
    than the saved KV bytes).

    int4 mode (kv_cache_int4) packs two int4 values per byte with the
    head-pair split layout of ops/pallas/paged_attention_int4.py: pools
    become (num_blocks, Hkv/2, block_size, D) int8 (pair slab p = heads
    2p low nibble / 2p+1 high nibble — recognizable by shape[1] != Hkv)
    and scale pools are (num_blocks, 2, Hkv/2, block_size) nibble planes.
    Halves the int8 pools' bytes again — both capacity and attention-read
    bandwidth (the long-audio and 64-slot regimes are KV-read-bound).
    """

    k: tuple
    v: tuple
    block_table: jnp.ndarray     # (B, max_blocks_per_slot) int32
    lengths: jnp.ndarray         # (B,) int32
    k_scale: tuple = ()
    v_scale: tuple = ()

    @property
    def block_size(self) -> int:
        return self.k[0].shape[2]   # pools are (N, heads-axis, bs, D)

    @property
    def num_blocks(self) -> int:
        return self.k[0].shape[0]

    @property
    def max_seq(self) -> int:
        """Per-slot position capacity (table width × block size)."""
        return self.block_table.shape[1] * self.block_size

    @property
    def quantized(self) -> bool:
        return len(self.k_scale) > 0


def init_paged_kv_cache(
    cfg: ModelConfig, batch: int, max_seq: int, *,
    num_blocks: int, block_size: int = 128, dtype=None, int8: bool = False,
    int4: bool = False,
) -> PagedKVCache:
    """Pool of `num_blocks` blocks (block 0 reserved as trash) + per-slot
    tables sized for max_seq positions."""
    if max_seq % block_size:
        raise ValueError(f"max_seq {max_seq} not a multiple of "
                         f"block_size {block_size}")
    if int8 and int4:
        raise ValueError("kv int8 and int4 are mutually exclusive")
    max_blocks = max_seq // block_size
    n = cfg.num_hidden_layers
    table = jnp.zeros((batch, max_blocks), jnp.int32)
    lengths = jnp.zeros((batch,), jnp.int32)
    hkv = cfg.num_key_value_heads
    # head-batched pool layout (N, heads-axis, bs, D) — see PagedKVCache
    shape = (num_blocks, hkv, block_size, cfg.head_dim)
    if int4:
        if hkv % 2:
            raise ValueError(f"int4 KV needs an even kv-head count, "
                             f"got {hkv} (head-pair packing)")
        pshape = (num_blocks, hkv // 2, block_size, cfg.head_dim)
        sshape = (num_blocks, 2, hkv // 2, block_size)   # nibble planes
        return PagedKVCache(
            k=tuple(jnp.zeros(pshape, jnp.int8) for _ in range(n)),
            v=tuple(jnp.zeros(pshape, jnp.int8) for _ in range(n)),
            block_table=table, lengths=lengths,
            k_scale=tuple(jnp.zeros(sshape, jnp.float32) for _ in range(n)),
            v_scale=tuple(jnp.zeros(sshape, jnp.float32) for _ in range(n)),
        )
    if int8:
        # positions-minor scales: heads-minor would tile-pad 8→128 lanes in
        # HBM and the padded scale DMA cost more than the saved KV bytes
        # (kv_kernel_bench measured the heads-minor int8 kernel SLOWER than
        # bf16 pools at B=64)
        sshape = (num_blocks, hkv, block_size)
        return PagedKVCache(
            k=tuple(jnp.zeros(shape, jnp.int8) for _ in range(n)),
            v=tuple(jnp.zeros(shape, jnp.int8) for _ in range(n)),
            block_table=table, lengths=lengths,
            k_scale=tuple(jnp.zeros(sshape, jnp.float32) for _ in range(n)),
            v_scale=tuple(jnp.zeros(sshape, jnp.float32) for _ in range(n)),
        )
    dt = dtype or param_dtype(cfg)
    return PagedKVCache(
        k=tuple(jnp.zeros(shape, dt) for _ in range(n)),
        v=tuple(jnp.zeros(shape, dt) for _ in range(n)),
        block_table=table, lengths=lengths,
    )


def init_kv_cache(
    cfg: ModelConfig, batch: int, max_seq: int, dtype=None,
    int8: bool = False,
) -> KVCache:
    shape = (batch, max_seq, cfg.num_key_value_heads, cfg.head_dim)
    n = cfg.num_hidden_layers
    if int8:
        sshape = (batch, max_seq, cfg.num_key_value_heads)
        return KVCache(
            k=tuple(jnp.zeros(shape, jnp.int8) for _ in range(n)),
            v=tuple(jnp.zeros(shape, jnp.int8) for _ in range(n)),
            lengths=jnp.zeros((batch,), jnp.int32),
            k_scale=tuple(jnp.zeros(sshape, jnp.float32) for _ in range(n)),
            v_scale=tuple(jnp.zeros(sshape, jnp.float32) for _ in range(n)),
        )
    dt = dtype or param_dtype(cfg)
    return KVCache(
        k=tuple(jnp.zeros(shape, dt) for _ in range(n)),
        v=tuple(jnp.zeros(shape, dt) for _ in range(n)),
        lengths=jnp.zeros((batch,), jnp.int32),
    )


def pool_scatter(c, rows, offs, new, n_mid=1):
    """Scatter per-position values into a head-batched pool.

    c: (N, *mid, bs[, D]) pool; rows/offs: (B, S) pool row / in-block
    offset per position; new: (B, S, *mid[, D]); n_mid = number of
    pool axes between the block row and the position axis (1 for K/V
    and int8-scale pools, 2 for int4 nibble-plane scale pools).

    A direct ``c.at[rows, :, offs]`` scatter has SEPARATED advanced
    dims — XLA relayouts the whole pool around it (two full-pool copies
    per write; HLO-verified, measured as a 30% serving regression at 64
    slots). Flattening (N, *mid) into one leading dim makes the advanced
    dims contiguous and keeps the default layout, so the scatter runs in
    place on the donated pool.
    """
    n = c.shape[0]
    mid = int(np.prod(c.shape[1:1 + n_mid])) if n_mid else 1
    tail = c.shape[1 + n_mid:]
    b, s = rows.shape
    flat = rows[:, :, None] * mid + jnp.arange(mid, dtype=rows.dtype)
    offs_b = jnp.broadcast_to(offs[:, :, None], (b, s, mid))
    c2 = c.reshape((n * mid,) + tail)
    new2 = new.reshape((b, s, mid) + tuple(tail[1:]))
    out = c2.at[flat, offs_b].set(
        new2.astype(c.dtype), mode="drop", unique_indices=True)
    return out.reshape(c.shape)


def _quantize_kv(x: jnp.ndarray):
    """(B, S, H, D) → int8 values + (B, S, H) fp32 scales."""
    scale = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1) / 127.0
    scale = jnp.maximum(scale, 1e-8)
    q = jnp.clip(
        jnp.round(x.astype(jnp.float32) / scale[..., None]), -127, 127
    ).astype(jnp.int8)
    return q, scale


def _attention(
    q: jnp.ndarray,      # (B, Sq, Hq, D)
    k: jnp.ndarray,      # (B, Skv, Hkv, D)
    v: jnp.ndarray,      # (B, Skv, Hkv, D)
    mask: jnp.ndarray,   # (B, Sq, Skv) bool — True = attend
) -> jnp.ndarray:
    """GQA attention without materializing repeated K/V: query heads are
    grouped per kv head and contracted directly (saves ~G× KV HBM traffic —
    the decode step is bandwidth-bound)."""
    b, sq, hq, d = q.shape
    hkv = k.shape[2]
    g = hq // hkv
    qg = q.reshape(b, sq, hkv, g, d)
    scale = 1.0 / math.sqrt(d)
    logits = jnp.einsum(
        "bqhgd,bkhd->bhgqk", qg, k, preferred_element_type=jnp.float32
    ) * scale
    logits = jnp.where(mask[:, None, None, :, :], logits, -1e30)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "bhgqk,bkhd->bqhgd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.reshape(b, sq, hq, d).astype(q.dtype)


def _layer(
    lp: Params,
    cfg: ModelConfig,
    x: jnp.ndarray,              # (B, S, H)
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    cache_k: jnp.ndarray,        # (B, max_seq, Hkv, D)
    cache_v: jnp.ndarray,
    write_pos: jnp.ndarray,      # (B,) int32 — where this chunk starts
    mask: jnp.ndarray,           # (B, S, kv_window)
    write_mask: jnp.ndarray,     # (B,) bool — slots this call may mutate
    kv_window: Optional[int],    # static: attend only to cache[:, :window]
    ks: Optional[jnp.ndarray] = None,   # (B, max_seq, Hkv) int8-mode scales
    vs: Optional[jnp.ndarray] = None,
    table: Optional[jnp.ndarray] = None,  # paged mode: (B, max_blocks)
):
    b, s, _ = x.shape
    hd, nq, nkv = cfg.head_dim, cfg.num_attention_heads, cfg.num_key_value_heads
    max_seq = cache_k.shape[1]

    h = rms_norm(x, lp["input_norm"], cfg.rms_norm_eps)
    q = mm(h, lp["wq"]).reshape(b, s, nq, hd)
    k = mm(h, lp["wk"]).reshape(b, s, nkv, hd)
    v = mm(h, lp["wv"]).reshape(b, s, nkv, hd)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)

    # Scatter this chunk into the cache at per-slot write_pos — but only for
    # slots in write_mask (continuous batching: prefilling one slot must not
    # clobber the cache of a slot that is mid-generation).
    if table is not None:
        # paged: position p of slot i lives at pool row table[i, p//bs],
        # offset p%bs. Masked slots (and unallocated table entries, which
        # are 0) land in the trash block — pool row 0, never allocated and
        # never attended (reads are masked by position). Duplicate trash
        # indices leave unspecified values only inside the trash block.
        blk_sz = cache_k.shape[2]   # head-batched pools (N, H', bs, …)
        pos = write_pos[:, None] + jnp.arange(s, dtype=jnp.int32)[None, :]
        rows = jnp.take_along_axis(table, pos // blk_sz, axis=1)
        rows = jnp.where(write_mask[:, None], rows, 0)
        offs = pos % blk_sz

        def write(c, new):
            # head-batched pools (N, H', bs[, D]): value (B, S, H'[, D]).
            # Serves K/V pools AND the int8 (N, Hkv, bs) scale pools.
            return pool_scatter(c, rows, offs, new, n_mid=1)

        def write_sc4(c, new):
            # int4 nibble-plane scale pools (N, 2, P2, bs): (B, S, 2, P2)
            return pool_scatter(c, rows, offs, new, n_mid=2)
    elif s == 1:
        # decode hot path: redirect masked slots to a trash position instead
        # of select-copying the whole cache (bandwidth!). Position max_seq-1
        # is never attended: active slots are frozen before reaching it.
        # One batched scatter (.at[b, pos].set) — unlike vmapped
        # dynamic_update_slice this aliases in the scan carry, so the cache
        # is updated in place instead of copied every token (measured
        # ~1.3 ms/token of pure copy traffic at batch 1).
        eff_pos = jnp.where(write_mask, write_pos, max_seq - 1)
        batch_idx = jnp.arange(x.shape[0])

        def write(c, new):
            return c.at[batch_idx, eff_pos].set(
                new[:, 0].astype(c.dtype), mode="drop",
                unique_indices=True, indices_are_sorted=True,
            )
    else:
        def write(c, new):
            def one(cb, nb, p, wm):
                starts = (p,) + (0,) * (cb.ndim - 1)
                upd = jax.lax.dynamic_update_slice(cb, nb, starts)
                return jnp.where(wm, upd, cb)
            return jax.vmap(one)(c, new, write_pos, write_mask)

    packed_i4 = table is not None and cache_k.shape[1] != nkv
    if packed_i4:
        from tts_inference_tpu.ops.pallas.paged_attention_int4 import (
            quantize_kv_int4, scales_to_planes,
        )

        kq, k_sc = quantize_kv_int4(k)     # (B,S,P2,D), (B,S,Hkv)
        vq, v_sc = quantize_kv_int4(v)
        cache_k = write(cache_k, kq)
        cache_v = write(cache_v, vq)
        ks = write_sc4(ks, scales_to_planes(k_sc))
        vs = write_sc4(vs, scales_to_planes(v_sc))
    elif ks is not None:
        kq, k_sc = _quantize_kv(k)
        vq, v_sc = _quantize_kv(v)
        cache_k = write(cache_k, kq)
        cache_v = write(cache_v, vq)
        ks = write(ks, k_sc)
        vs = write(vs, v_sc)
    else:
        cache_k = write(cache_k, k.astype(cache_k.dtype))
        cache_v = write(cache_v, v.astype(cache_v.dtype))

    attn = None
    if table is not None:
        blk_sz = cache_k.shape[2]
        cap = table.shape[1] * blk_sz
        w = cap if (kv_window is None or kv_window >= cap) else kv_window
        assert w % blk_sz == 0, (w, blk_sz)  # forward() block-aligns it
        idx = table[:, : w // blk_sz]
        use_kernel = cfg.use_pallas_attention or (
            jax.default_backend() == "tpu"
        )
        if s == 1 and use_kernel:
            # paged decode hot path: the Pallas kernel streams pool blocks
            # through VMEM once, driven by the block table — no gathered
            # window temp in HBM (ops/pallas/paged_attention.py). Default ON
            # for TPU: measured 0.73 ms/layer vs 1.50 ms for the XLA gather
            # at (B=8, W=512) — paged without the kernel is strictly worse
            # (PERF.md). int8 pools dequant in VMEM right after the DMA
            # (half the HBM bytes of the fp kernel).
            from tts_inference_tpu.ops.pallas.paged_attention import (
                paged_decode_attention,
                paged_decode_attention_int8,
            )

            qg = q.reshape(b, nkv, nq // nkv, hd)
            if packed_i4:
                from tts_inference_tpu.ops.pallas.paged_attention_int4 import (  # noqa: E501
                    paged_decode_attention_int4,
                )

                attn = paged_decode_attention_int4(
                    qg, cache_k, cache_v, ks, vs, idx, write_pos
                ).reshape(b, 1, nq, hd)
            elif ks is None:
                attn = paged_decode_attention(
                    qg, cache_k, cache_v, idx, write_pos
                ).reshape(b, 1, nq, hd)
            else:
                attn = paged_decode_attention_int8(
                    qg, cache_k, cache_v, ks, vs, idx, write_pos
                ).reshape(b, 1, nq, hd)
        elif packed_i4:
            # XLA int4 view (CPU tests, prefill): gather packed blocks,
            # unpack the nibbles, dequantize with the nibble-plane scales
            from tts_inference_tpu.ops.pallas.paged_attention_int4 import (
                planes_to_scales, unpack_kv_int4,
            )

            dt = k.dtype
            # (B, WB, P2, bs, D) → (B, WB, bs, P2, D) → ints (…, Hkv, D)
            k_int = unpack_kv_int4(jnp.moveaxis(cache_k[idx], 2, 3), nkv)
            v_int = unpack_kv_int4(jnp.moveaxis(cache_v[idx], 2, 3), nkv)
            # (B, WB, 2, P2, bs) → (B, WB, bs, 2, P2) → (B, WB, bs, Hkv)
            sck = planes_to_scales(jnp.moveaxis(ks[idx], 4, 2))
            scv = planes_to_scales(jnp.moveaxis(vs[idx], 4, 2))
            ck = (k_int.astype(jnp.float32) * sck[..., None]).reshape(
                b, w, nkv, hd).astype(dt)
            cv = (v_int.astype(jnp.float32) * scv[..., None]).reshape(
                b, w, nkv, hd).astype(dt)
        else:
            # XLA paged view: gather the window's blocks from the pool into
            # a dense (B, window, Hkv, D) temp — correct everywhere (CPU
            # tests, int8 pools); pays the window bytes twice vs the kernel
            ck = jnp.moveaxis(cache_k[idx], 2, 3).reshape(b, w, nkv, hd)
            cv = jnp.moveaxis(cache_v[idx], 2, 3).reshape(b, w, nkv, hd)
            if ks is not None:
                dt = k.dtype
                # paged int8 scale pools are positions-minor (N, Hkv, bs)
                sck = jnp.swapaxes(ks[idx], -1, -2).reshape(b, w, nkv)
                scv = jnp.swapaxes(vs[idx], -1, -2).reshape(b, w, nkv)
                ck = (ck.astype(jnp.float32) * sck[..., None]).astype(dt)
                cv = (cv.astype(jnp.float32) * scv[..., None]).astype(dt)
    else:
        win = (slice(None), slice(None, kv_window)) if (
            kv_window is not None and kv_window < max_seq) else (slice(None),)
        ck, cv = cache_k[win], cache_v[win]
        if ks is not None:
            dt = k.dtype
            ck = (ck.astype(jnp.float32) * ks[win][..., None]).astype(dt)
            cv = (cv.astype(jnp.float32) * vs[win][..., None]).astype(dt)
    if attn is not None:
        pass
    elif s == 1 and cfg.use_pallas_attention and table is None:
        from tts_inference_tpu.ops.pallas.decode_attention import (
            decode_attention,
        )

        qg = q.reshape(b, nkv, nq // nkv, hd)
        attn = decode_attention(qg, ck, cv, write_pos).reshape(b, 1, nq, hd)
    else:
        attn = _attention(q, ck, cv, mask)
    attn = attn.reshape(b, s, nq * hd)
    x = x + mm(attn, lp["wo"])

    h = rms_norm(x, lp["post_attn_norm"], cfg.rms_norm_eps)
    gate = jax.nn.silu(mm(h, lp["w_gate"]).astype(jnp.float32)).astype(h.dtype)
    x = x + mm(gate * mm(h, lp["w_up"]), lp["w_down"])
    return x, cache_k, cache_v, ks, vs


def forward(
    params: Params,
    cfg: ModelConfig,
    tokens: jnp.ndarray,         # (B, S) int32
    cache: KVCache,
    write_pos: jnp.ndarray,      # (B,) int32 — chunk start per slot
    seg_lens: jnp.ndarray,       # (B,) int32 — valid tokens in this chunk
    kv_window: Optional[int] = None,  # static: attend to cache[:, :window]
) -> Tuple[jnp.ndarray, KVCache]:
    """Process a token chunk against the cache; returns (final-norm hidden
    states (B, S, H), new cache). Project with :func:`compute_logits`.

    Serves both prefill (S = padded prompt bucket, write_pos = 0) and decode
    (S = 1..n). Positions are write_pos + arange(S); attention allows
    kv slot j for query position p iff j <= p and j < write_pos + seg_len
    (causal + per-slot validity). Padded query rows produce garbage logits
    that the caller ignores; their cache writes land beyond the advancing
    length and are overwritten or masked later.

    `kv_window` (static) bounds the attention read to the cache prefix —
    the decode step is HBM-bound and reading all of max_seq for short
    sequences wastes most of the bandwidth; the engine buckets it.
    """
    b, s = tokens.shape
    max_seq = cache.max_seq
    window = max_seq if kv_window is None else min(kv_window, max_seq)
    is_paged = isinstance(cache, PagedKVCache)
    table = cache.block_table if is_paged else None
    if is_paged:  # the paged view gathers whole blocks — align the window
        bs_blk = cache.block_size
        window = min(-(-window // bs_blk) * bs_blk, max_seq)

    positions = write_pos[:, None] + jnp.arange(s, dtype=jnp.int32)[None, :]
    cos, sin = rope_tables(cfg, positions)

    kv_idx = jnp.arange(window, dtype=jnp.int32)
    mask = kv_idx[None, None, :] <= positions[:, :, None]

    write_mask = seg_lens > 0
    x = embed_rows(params["embed"], tokens, param_dtype(cfg))

    quantized = cache.quantized
    new_k, new_v, new_ks, new_vs = [], [], [], []
    for li, lp in enumerate(params["layers"]):
        x, ck, cv, ks, vs = _layer(
            lp, cfg, x, cos, sin,
            cache.k[li], cache.v[li], write_pos, mask, write_mask,
            window if window < max_seq else None,
            cache.k_scale[li] if quantized else None,
            cache.v_scale[li] if quantized else None,
            table=table,
        )
        new_k.append(ck)
        new_v.append(cv)
        if quantized:
            new_ks.append(ks)
            new_vs.append(vs)

    x = rms_norm(x, params["final_norm"], cfg.rms_norm_eps)

    new_lengths = jnp.maximum(cache.lengths, write_pos + seg_lens)
    if is_paged:
        new_cache: Any = PagedKVCache(
            k=tuple(new_k), v=tuple(new_v),
            block_table=table, lengths=new_lengths,
            k_scale=tuple(new_ks), v_scale=tuple(new_vs),
        )
    else:
        new_cache = KVCache(
            k=tuple(new_k), v=tuple(new_v),
            lengths=new_lengths,
            k_scale=tuple(new_ks), v_scale=tuple(new_vs),
        )
    return x, new_cache


def compute_logits(params: Params, cfg: ModelConfig, hidden: jnp.ndarray,
                   base: int = 0) -> jnp.ndarray:
    """Final-norm hidden (…, H) → fp32 logits (…, V - base).

    Kept separate from forward() so prefill can project only the last valid
    position per slot instead of materializing (B, S, V) — at the Orpheus
    vocab (156,940) a full 512-bucket prefill logits tensor would be 320 MB.

    ``base`` (static, default 0 = full vocab) computes only head rows
    [base, V): the sliced-head decode path (protocol.HEAD_SLICE_BASE skips
    the 128k plain-text rows a TTS generation never emits — ~394 MB less
    HBM per step at int8). Logit i corresponds to token id base + i.
    """
    if cfg.tie_word_embeddings or "lm_head" not in params:
        return tied_logits(hidden, params["embed"], base)
    return head_logits(hidden, params["lm_head"], base)


def prefill(
    params: Params,
    cfg: ModelConfig,
    tokens: jnp.ndarray,      # (B, S) right-padded prompt bucket
    prompt_lens: jnp.ndarray,  # (B,)
    cache: KVCache,
    kv_window: Optional[int] = None,
    logits_base: int = 0,
) -> Tuple[jnp.ndarray, KVCache]:
    """Prefill the cache; returns (last-valid-position logits (B, V), cache).

    A prompt only attends to itself, so kv_window defaults to the bucket
    width (the padded prompt length)."""
    zero = jnp.zeros_like(prompt_lens)
    if kv_window is None:
        kv_window = tokens.shape[1]
    hidden, cache = forward(
        params, cfg, tokens, cache, zero, prompt_lens, kv_window=kv_window
    )
    last = jnp.maximum(prompt_lens - 1, 0)
    b = tokens.shape[0]
    last_hidden = hidden[jnp.arange(b), last]          # (B, H)
    return compute_logits(params, cfg, last_hidden, logits_base), cache


def decode_one(
    params: Params,
    cfg: ModelConfig,
    token: jnp.ndarray,       # (B,) int32 — previous token per slot
    cache: KVCache,
    active: Optional[jnp.ndarray] = None,
    kv_window: Optional[int] = None,
    logits_base: int = 0,
) -> Tuple[jnp.ndarray, KVCache]:
    """One decode step for every slot; returns (logits (B, V), new cache).

    `active` (B,) bool freezes finished slots: their KV write lands at the
    trash slot (max_seq-1, never attended) and lengths don't advance.
    """
    seg = (jnp.ones_like(cache.lengths) if active is None
           else active.astype(jnp.int32))
    hidden, cache = forward(
        params, cfg, token[:, None], cache, cache.lengths, seg,
        kv_window=kv_window,
    )
    return compute_logits(params, cfg, hidden[:, 0], logits_base), cache
