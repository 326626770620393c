"""Per-component accounting of the serving forward (VERDICT r2 item 3).

Times each stage of the flagship predict forward separately on the real
chip — dual ViT towers, projector, Qwen2 decoder, hidden-state extraction,
bridge head, and the dynamic-quantization ops — under bf16 / weight-only
int8 / w8a8, so the gap between the measured chunk rate and the int8-MXU
ceiling (BASELINE.md: ~295 chunks/s) is attributed per op instead of
guessed. Prints one JSON object; commit the result to BREAKDOWN.md.

Methodology matches bench.py: K-iteration scan chains with distinct
per-iteration inputs (the tunnel memoizes identical executions), dispatch
overhead measured with a control matmul and subtracted, scalar fetch only.
"""

from __future__ import annotations

import json
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/tmp/vla_adapter_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from bench import (  # noqa: E402
    flops_per_chunk,
    measure_dispatch_overhead,
    timed_calls,
    vit_flops,
    zeros_like_shapes,
)

K_CHAIN = 12
ITERS = 6


def chain_time(fn, make_inputs, overhead, k_chain=K_CHAIN, iters=ITERS):
    """Per-call seconds of fn via a K-iteration scan with distinct inputs.

    make_inputs(rng) -> pytree of base arrays WITHOUT a leading K axis; the
    chain perturbs every float leaf with a distinct per-iteration scalar
    offset (bench.py's trick) so XLA cannot hoist work out of the loop and
    the relay never sees two identical executions — WITHOUT materializing
    K x iters full-size input stacks on device (a batch-16 pixel stack
    would be ~2.3 GB per arg set and OOM the 16 GB chip).
    """

    def is_float(x):
        return jnp.issubdtype(x.dtype, jnp.floating)

    @jax.jit
    def chain(base, eps):
        def body(acc, e):
            xs = jax.tree.map(
                lambda x: x + e.astype(x.dtype) if is_float(x) else x, base)
            return acc + fn(xs).astype(jnp.float32).mean(), None

        acc, _ = lax.scan(body, jnp.float32(0), eps)
        return acc

    base = jax.tree.map(jnp.asarray, make_inputs(np.random.default_rng(7000)))

    def fresh(i):
        r = np.random.default_rng(7100 + i)
        return (base,
                jnp.asarray(r.normal(scale=1e-3, size=(k_chain,)), jnp.float32))

    wall = timed_calls(chain, [fresh(i) for i in range(iters)], fresh(-1))
    return max(wall - overhead, 1e-9) / k_chain


def build(cfg, mode: str):
    from vla_adapter_tpu.models.layers import Runtime

    kw = dict(dtype=jnp.bfloat16, param_dtype=jnp.bfloat16, attn_impl="auto")
    if mode == "bf16":
        return Runtime(**kw)
    if mode == "int8":
        return Runtime(**kw, weights_int8=True)
    if mode == "w8a8":
        return Runtime(**kw, weights_int8=True, act_int8=True)
    raise ValueError(mode)


def init_zeros(module, *args, **kwargs):
    shapes = jax.eval_shape(lambda: module.init(jax.random.key(0), *args,
                                                **kwargs))
    return zeros_like_shapes(shapes)


def main():
    from vla_adapter_tpu.core.config import VLAConfig
    from vla_adapter_tpu.models.action_head import L1RegressionActionHead
    from vla_adapter_tpu.models.llm import llm_model_class
    from vla_adapter_tpu.models.projector import FusedProjector
    from vla_adapter_tpu.models.vla import FusedVisionBackbone, VLAModel
    from vla_adapter_tpu.models.layers import quantize_rows

    cfg = VLAConfig()
    v = cfg.vision
    consts = cfg.constants
    overhead = measure_dispatch_overhead()
    out = {"dispatch_overhead_ms": round(overhead * 1e3, 2)}

    import gc

    # w8a8 is the headline serving mode; bf16 reference numbers live in
    # bench.py's sweep. Keep the combo count low — every stage x mode x
    # batch is a fresh flagship compile (minutes each through the tunnel).
    for mode in ("w8a8",):
        for batch in (1, 16):
            rt = build(cfg, mode)
            res = {}

            # --- full forward (reference point; equals bench.py) ----------
            model = VLAModel(cfg, rt)
            t_text, num_q = cfg.max_text_tokens, consts.num_action_query_tokens
            ids = jnp.zeros((batch, t_text), jnp.int32).at[:, :24].set(100)
            plen = jnp.full((batch,), 24, jnp.int32)
            valid = (jnp.zeros((batch, t_text), jnp.int32)
                     .at[:, : 24 + num_q + 1].set(1))
            pix_shape = (batch, v.num_images, v.primary.image_size,
                         v.primary.image_size, v.channels_per_image)
            params = init_zeros(
                model, input_ids=ids, prompt_len=plen, text_valid=valid,
                pixel_values=jnp.zeros(pix_shape, jnp.bfloat16),
                proprio=jnp.zeros((batch, consts.proprio_dim), jnp.float32))

            def full_fn(xs):
                return model.apply(
                    params, input_ids=ids, prompt_len=plen, text_valid=valid,
                    pixel_values=xs["pix"], proprio=xs["pr"])["actions"]

            def record(key, t):
                res[key] = t
                print(f"# {mode}_b{batch} {key}: {t*1e3:.3f} ms", flush=True)

            record("full", chain_time(
                full_fn,
                lambda r: {"pix": jnp.asarray(
                    r.normal(size=pix_shape), jnp.bfloat16),
                    "pr": jnp.asarray(r.normal(
                        size=(batch, consts.proprio_dim)), jnp.float32)},
                overhead))

            # --- vision towers + projector --------------------------------
            vision = FusedVisionBackbone(cfg, rt)
            vis_params = init_zeros(vision, jnp.zeros(pix_shape, jnp.bfloat16))
            proj = FusedProjector(cfg.llm.hidden_size, rt=rt)
            proj_params = init_zeros(
                proj, jnp.zeros((batch, cfg.num_patches, v.embed_dim),
                                jnp.bfloat16))

            def vis_proj_fn(xs):
                return proj.apply(proj_params, vision.apply(vis_params,
                                                            xs["pix"]))

            record("vision_proj", chain_time(
                vis_proj_fn,
                lambda r: {"pix": jnp.asarray(
                    r.normal(size=pix_shape), jnp.bfloat16)},
                overhead))

            # --- LLM over the multimodal sequence -------------------------
            llm = llm_model_class(cfg.llm)(cfg.llm, rt)
            s_mm = cfg.num_patches + t_text
            emb_shape = (batch, s_mm, cfg.llm.hidden_size)
            llm_params = init_zeros(
                llm, inputs_embeds=jnp.zeros(emb_shape, jnp.bfloat16),
                causal=False, output_hidden_states=True)

            def llm_fn(xs):
                return llm.apply(
                    llm_params, inputs_embeds=xs["emb"], causal=False,
                    output_hidden_states=True)["hidden_states"]

            record("llm", chain_time(
                llm_fn,
                lambda r: {"emb": jnp.asarray(
                    r.normal(size=emb_shape), jnp.bfloat16)},
                overhead))

            # --- bridge head on fixed hidden states -----------------------
            head = L1RegressionActionHead(
                cfg.head, action_dim=consts.action_dim,
                num_actions_chunk=consts.num_actions_chunk,
                num_task_tokens=cfg.num_patches, rt=rt)
            hs_shape = (batch, cfg.llm.num_layers + 1,
                        cfg.num_patches + num_q, cfg.llm.hidden_size)
            pf_shape = (batch, 1, cfg.llm.hidden_size)
            head_params = init_zeros(
                head, jnp.zeros(hs_shape, jnp.bfloat16),
                jnp.zeros(pf_shape, jnp.bfloat16))

            def head_fn(xs):
                return head.apply(head_params, xs["hs"], xs["pf"])

            record("head", chain_time(
                head_fn,
                lambda r: {"hs": jnp.asarray(
                    r.normal(size=hs_shape), jnp.bfloat16),
                    "pf": jnp.asarray(r.normal(size=pf_shape), jnp.bfloat16)},
                overhead))

            # --- dynamic activation quantization alone --------------------
            if mode == "w8a8":
                qx_shape = (batch, s_mm, cfg.llm.hidden_size)

                def quant_fn(xs):
                    xq, scale = quantize_rows(xs["x"])
                    return xq.astype(jnp.float32).sum() + scale.sum()

                # one LLM-shaped quantize x 24 layers x 7 matmuls/layer as a
                # rough upper bound of the standalone (unfused) cost
                record("quantize_rows_one", chain_time(
                    quant_fn,
                    lambda r: {"x": jnp.asarray(
                        r.normal(size=qx_shape), jnp.bfloat16)},
                    overhead))

            res = {k: round(t * 1e3, 3) for k, t in res.items()}
            res["sum_vision_proj_llm_head"] = round(
                res["vision_proj"] + res["llm"] + res["head"], 3)
            out[f"{mode}_b{batch}"] = res
            print(f"# {mode}_b{batch}: {json.dumps(res)}", flush=True)
            del params, vis_params, proj_params, llm_params, head_params
            gc.collect()
            jax.clear_caches()

    # analytic floors for context
    fl = flops_per_chunk(cfg)
    vis_fl = (vit_flops(v.primary, v.num_images)
              + vit_flops(v.fused, v.num_images))
    out["analytic"] = {
        "total_tflop_per_chunk": round(fl / 1e12, 4),
        "vision_tflop": round(vis_fl / 1e12, 4),
        "int8_floor_ms_total": round(fl / 394e12 * 1e3, 3),
        "bf16_floor_ms_total": round(fl / 197e12 * 1e3, 3),
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
