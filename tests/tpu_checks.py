"""Real-TPU property checks, run directly on a TPU host.

The pytest suite (tests/conftest.py) forces an 8-device virtual CPU mesh,
so checks that need actual TPU hardware — the Pallas kernels' hardware
PRNG, Mosaic lowering, and on-chip numerics — live here as a plain script:

    python tests/tpu_checks.py

Exits non-zero on the first failure.  Covers:
- Pallas grain kernel compiles (Mosaic lowering) and produces real noise,
- noise statistics: channel std scaling x2 R / x3 B, unit green std,
  near-zero mean (the reference's grain contract,
  /root/reference/nodes.py:53-60),
- determinism: same seed+frame_start => identical output; batch-boundary
  invariance (/root/reference/VRGDG_StandaloneVideoEnhancerNodes.py:261-275),
- Pallas fused grade kernel parity vs the jnp ops path (when present).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def check(name, fn):
    print(f"[tpu_checks] {name} ...", flush=True)
    fn()
    print(f"[tpu_checks] {name} OK", flush=True)


def main() -> int:
    import jax
    import jax.numpy as jnp

    backend = jax.default_backend()
    print(f"[tpu_checks] backend={backend} devices={jax.devices()}")
    if backend not in ("tpu", "axon"):
        print("[tpu_checks] ERROR: not running on TPU hardware", file=sys.stderr)
        return 2

    from vrgdg_tpu.kernels.grain_pallas import film_grain_pallas

    def grain_compiles_and_makes_noise():
        frames = jnp.full((2, 32, 128, 3), 0.5, jnp.float32)
        out = np.asarray(film_grain_pallas(frames, 0.05, 0.5, seed=11,
                                           interpret=False))
        assert out.shape == (2, 32, 128, 3)
        spread = out.std()
        assert spread > 1e-3, f"kernel produced no noise (std={spread})"

    def grain_statistics():
        frames = jnp.full((4, 128, 128, 3), 0.5, jnp.float32)
        out = film_grain_pallas(frames, 0.01, 1.0, seed=3, interpret=False)
        noise = (np.asarray(out) - 0.5) / 0.01
        stds = noise.reshape(-1, 3).std(axis=0)
        np.testing.assert_allclose(stds[0] / stds[1], 2.0, rtol=0.05)
        np.testing.assert_allclose(stds[2] / stds[1], 3.0, rtol=0.05)
        np.testing.assert_allclose(stds[1], 1.0, rtol=0.05)
        np.testing.assert_allclose(noise.mean(), 0.0, atol=0.02)

    def grain_desaturation():
        # saturation_mix=0 -> all three channels share the green noise.
        frames = jnp.full((1, 32, 128, 3), 0.5, jnp.float32)
        out = np.asarray(film_grain_pallas(frames, 0.05, 0.0, seed=5,
                                           interpret=False))
        r, g, b = out[..., 0], out[..., 1], out[..., 2]
        np.testing.assert_allclose(r, g, atol=1e-6)
        np.testing.assert_allclose(b, g, atol=1e-6)

    def grain_determinism_and_batch_invariance():
        frames = jnp.full((6, 32, 128, 3), 0.5, jnp.float32)
        whole = np.asarray(film_grain_pallas(frames, 0.08, 0.5, seed=123,
                                             frame_start=0, interpret=False))
        again = np.asarray(film_grain_pallas(frames, 0.08, 0.5, seed=123,
                                             frame_start=0, interpret=False))
        np.testing.assert_array_equal(whole, again)
        parts = np.concatenate([
            np.asarray(film_grain_pallas(frames[:2], 0.08, 0.5, seed=123,
                                         frame_start=0, interpret=False)),
            np.asarray(film_grain_pallas(frames[2:], 0.08, 0.5, seed=123,
                                         frame_start=2, interpret=False)),
        ])
        np.testing.assert_array_equal(whole, parts)

    def grade_pallas_grain_mode():
        # grain_mode="pallas" through the full grade stack on chip: noise
        # statistics must survive the integration.
        from vrgdg_tpu.core.params import GrainParams
        from vrgdg_tpu.ops.grade import GradeConfig, grade

        frames = jnp.full((2, 128, 128, 3), 0.5, jnp.float32)
        cfg = GradeConfig(grain=GrainParams.normalize(0.01, 1.0, seed=9),
                          grain_mode="pallas")
        out = np.asarray(grade(frames, cfg))
        noise = (out - 0.5) / 0.01
        stds = noise.reshape(-1, 3).std(axis=0)
        np.testing.assert_allclose(stds[0] / stds[1], 2.0, rtol=0.05)
        np.testing.assert_allclose(stds[2] / stds[1], 3.0, rtol=0.05)

    def bundle_lut_parity_on_chip():
        # the production corner-bundle LUT path vs the reference
        # eight-gather path, on real hardware
        import jax.numpy as jnp

        from vrgdg_tpu.core.cube import build_palette_lut, corner_bundle
        from vrgdg_tpu.ops.lut import apply_lut, apply_lut_bundle

        lut = build_palette_lut("#0b1d51, #1f6aa5, #f3d27a", 33)
        bundle = jnp.asarray(corner_bundle(lut))
        frames = jnp.asarray(np.random.default_rng(5)
                             .uniform(0, 1, (2, 128, 256, 3))
                             .astype(np.float32))
        a = np.asarray(apply_lut(frames, lut, strength=7.0))
        b = np.asarray(apply_lut_bundle(frames, bundle, strength=7.0))
        err = np.abs(a - b).max()
        assert err < 1e-6, f"bundle LUT diverges on chip: {err}"

    def grade_stack_on_chip_vs_cpu_reference():
        # full fused grade (no grain: that is distributional) on chip vs
        # the same math on CPU — guards against TPU-specific numeric
        # drift in LUT/adjust/colormatch/sharpen
        import subprocess
        import sys as _sys

        import jax.numpy as jnp

        from vrgdg_tpu.core.cube import build_palette_lut
        from vrgdg_tpu.core.params import (AdjustSettings, ColorMatchParams,
                                           LUTParams, SharpenParams)
        from vrgdg_tpu.ops.color_match import lab_statistics
        from vrgdg_tpu.ops.grade import GradeConfig, grade

        rng = np.random.default_rng(11)
        frames_np = rng.uniform(0, 1, (2, 96, 160, 3)).astype(np.float32)
        ref_np = rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)
        config = GradeConfig(
            lut=LUTParams.normalize(8.0),
            adjust=AdjustSettings.normalize({"contrast": 15, "vignette": 20}),
            color_match=ColorMatchParams.normalize(0.7),
            sharpen=SharpenParams.normalize(1.5, border="zero"))
        lut = build_palette_lut("#0b1d51, #1f6aa5, #f3d27a", 33)
        on_chip = np.asarray(grade(jnp.asarray(frames_np), config,
                                   lut=lut, reference=jnp.asarray(ref_np)))

        # run the identical grade on the CPU backend in a subprocess
        code = (
            "import jax, numpy as np; "
            "jax.config.update('jax_platforms', 'cpu'); "
            "import jax.numpy as jnp; "
            "from vrgdg_tpu.core.cube import build_palette_lut; "
            "from vrgdg_tpu.core.params import (AdjustSettings, "
            "ColorMatchParams, LUTParams, SharpenParams); "
            "from vrgdg_tpu.ops.grade import GradeConfig, grade; "
            "rng = np.random.default_rng(11); "
            "frames = rng.uniform(0, 1, (2, 96, 160, 3)).astype(np.float32); "
            "ref = rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32); "
            "config = GradeConfig(lut=LUTParams.normalize(8.0), "
            "adjust=AdjustSettings.normalize({'contrast': 15, "
            "'vignette': 20}), "
            "color_match=ColorMatchParams.normalize(0.7), "
            "sharpen=SharpenParams.normalize(1.5, border='zero')); "
            "lut = build_palette_lut('#0b1d51, #1f6aa5, #f3d27a', 33); "
            "out = grade(jnp.asarray(frames), config, lut=lut, "
            "reference=jnp.asarray(ref)); "
            "np.save('/tmp/vrgdg_cpu_grade.npy', np.asarray(out))"
        )
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        subprocess.run([_sys.executable, "-c", code], check=True, env=env,
                       cwd=os.path.dirname(os.path.dirname(
                           os.path.abspath(__file__))))
        on_cpu = np.load("/tmp/vrgdg_cpu_grade.npy")
        err = np.abs(on_chip - on_cpu).max()
        assert err < 1e-3, f"TPU grade diverges from CPU grade: {err}"

    check("bundle LUT: on-chip parity vs reference path",
          bundle_lut_parity_on_chip)
    check("fused grade: on-chip vs CPU backend parity",
          grade_stack_on_chip_vs_cpu_reference)
    check("pallas grain: compiles + noise", grain_compiles_and_makes_noise)
    check("pallas grain: channel statistics", grain_statistics)
    check("pallas grain: desaturation broadcast", grain_desaturation)
    check("pallas grain: determinism/batch invariance",
          grain_determinism_and_batch_invariance)
    check("grade grain_mode=pallas on chip", grade_pallas_grain_mode)

    def enhancer_job_end_to_end():
        # Full L3 path on the real chip: decode -> uint8 device step ->
        # encode -> segment commit -> concat (native stream copy when no
        # ffmpeg). Small shapes so compile time stays bounded.
        import shutil
        import tempfile

        import cv2

        from vrgdg_tpu.jobs import enhancer as enh
        from vrgdg_tpu.runtime import video_io

        workdir = tempfile.mkdtemp(prefix="vrgdg_tpu_check_")
        try:
            clip = os.path.join(workdir, "clip.mp4")
            writer = cv2.VideoWriter(clip, cv2.VideoWriter_fourcc(*"mp4v"),
                                     12.0, (96, 64))
            rng = np.random.default_rng(0)
            for _ in range(30):
                writer.write(rng.integers(0, 255, (64, 96, 3), np.uint8))
            writer.release()
            registry = enh.JobRegistry()
            snap = enh.start_render(
                {"source_path": clip,
                 "settings": {"segment_seconds": 5, "grain_enabled": True,
                              "sharpen_strength": 1.0, "seed": 7}},
                registry=registry, base_folder=workdir)
            job_id = snap["job_id"]
            import time as _time
            deadline = _time.time() + 420
            while _time.time() < deadline:
                state = registry.snapshot(job_id)
                if state.get("status") in {"complete", "failed", "canceled"}:
                    break
                _time.sleep(0.5)
            assert state.get("status") == "complete", state.get("error")
            meta = video_io.probe_video(state["output_path"])
            assert meta["frame_count"] == 30, meta
            totals = state.get("stage_seconds_total") or {}
            assert {"decode", "device", "encode",
                    "concat"} <= set(totals), totals
        finally:
            shutil.rmtree(workdir, ignore_errors=True)

    check("enhancer job end-to-end on chip", enhancer_job_end_to_end)

    def enhancer_cancel_resume_byte_equality():
        # Checkpoint recovery on real hardware: cancel a job mid-run,
        # resume it by id, and require the final video byte-identical to
        # an uninterrupted render of the same job (the resume-equality
        # guarantee, proven on the CPU backend by tests/test_enhancer_job
        # and here on the chip's actual uint8 device path).
        import shutil
        import tempfile
        import time as _time

        import cv2

        from vrgdg_tpu.jobs import enhancer as enh
        from vrgdg_tpu.runtime import video_io

        def _decode(path):
            capture = cv2.VideoCapture(path)
            frames = []
            while True:
                ok, frame = capture.read()
                if not ok:
                    break
                frames.append(frame)
            capture.release()
            return frames

        def _wait(registry, job_id, states, timeout=420):
            deadline = _time.time() + timeout
            while _time.time() < deadline:
                state = registry.snapshot(job_id)
                if state.get("status") in states:
                    return state
                _time.sleep(0.2)
            raise AssertionError(f"timed out waiting for {states}: {state}")

        workdir = tempfile.mkdtemp(prefix="vrgdg_tpu_resume_")
        try:
            clip = os.path.join(workdir, "clip.mp4")
            writer = cv2.VideoWriter(clip, cv2.VideoWriter_fourcc(*"mp4v"),
                                     12.0, (96, 64))
            rng = np.random.default_rng(1)
            for _ in range(36):  # 3 segments of 12 frames
                writer.write(rng.integers(0, 255, (64, 96, 3), np.uint8))
            writer.release()
            settings = {"segment_seconds": 1, "grain_enabled": True,
                        "sharpen_strength": 1.0, "seed": 9}

            reg_a = enh.JobRegistry()
            job_a = enh.start_render({"source_path": clip,
                                      "settings": settings},
                                     registry=reg_a,
                                     base_folder=os.path.join(workdir, "a"))
            done_a = _wait(reg_a, job_a["job_id"], {"complete"})

            reg_b = enh.JobRegistry()
            job_b = enh.start_render({"source_path": clip,
                                      "settings": settings},
                                     registry=reg_b,
                                     base_folder=os.path.join(workdir, "b"))
            job_id = job_b["job_id"]
            # cancel once at least one segment is committed
            deadline = _time.time() + 420
            while _time.time() < deadline:
                state = reg_b.snapshot(job_id)
                if int(state.get("frames_processed") or 0) >= 12:
                    break
                if state.get("status") in {"complete", "failed"}:
                    break
                _time.sleep(0.1)
            enh.cancel_render(job_id, registry=reg_b)
            state = _wait(reg_b, job_id,
                          {"canceled", "complete"})
            if state["status"] == "canceled":
                assert state.get("can_resume"), state
                enh.start_render({}, resume_job_id=job_id, registry=reg_b,
                                 base_folder=os.path.join(workdir, "b"))
                state = _wait(reg_b, job_id, {"complete"})
            frames_a = _decode(done_a["output_path"])
            frames_b = _decode(state["output_path"])
            assert len(frames_a) == len(frames_b) == 36
            assert all(np.array_equal(x, y)
                       for x, y in zip(frames_a, frames_b)), \
                "resumed output differs from uninterrupted render"
        finally:
            shutil.rmtree(workdir, ignore_errors=True)

    check("enhancer cancel->resume byte equality on chip",
          enhancer_cancel_resume_byte_equality)

    def fused_pallas_grade_parity():
        from vrgdg_tpu.core.cube import build_palette_lut
        from vrgdg_tpu.core.params import (ColorMatchParams, GrainParams,
                                           LUTParams, SharpenParams)
        from vrgdg_tpu.ops.color_match import lab_statistics
        from vrgdg_tpu.ops.grade import GradeConfig, grade

        lut = build_palette_lut("#0b1d51, #1f6aa5, #f3d27a", 33)
        rng = np.random.default_rng(9)
        frames = jnp.asarray(rng.uniform(0, 1, (2, 144, 1152, 3))
                             .astype(np.float32))
        ref_stats = lab_statistics(jnp.asarray(
            rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)))
        base = dict(lut=LUTParams.normalize(8.0),
                    color_match=ColorMatchParams.normalize(0.7),
                    sharpen=SharpenParams.normalize(1.5, border="zero"))
        want = grade(frames, GradeConfig(**base), lut=lut,
                     ref_stats=ref_stats)
        got = grade(frames, GradeConfig(**base, fused_mode="pallas"),
                    lut=lut, ref_stats=ref_stats)
        err = float(jnp.max(jnp.abs(got - want)))
        assert err < 2e-5, f"fused pallas diverged from XLA: {err}"

        # with grain: real hardware noise obeying the channel contract
        grain_cfg = GradeConfig(**base, fused_mode="pallas",
                                grain=GrainParams.normalize(0.02, 1.0,
                                                            seed=5))
        noisy = grade(frames, grain_cfg, lut=lut, ref_stats=ref_stats)
        noise = (np.asarray(noisy) - np.asarray(got)).reshape(-1, 3)
        # clipping trims tails; check ordering and rough scale instead
        stds = noise.std(axis=0)
        assert stds[1] > 0.005, f"no grain noise: {stds}"
        assert stds[0] > 1.4 * stds[1], f"R scaling missing: {stds}"
        assert stds[2] > stds[0], f"B scaling missing: {stds}"
        again = grade(frames, grain_cfg, lut=lut, ref_stats=ref_stats)
        assert np.array_equal(np.asarray(noisy), np.asarray(again)), \
            "fused pallas grain is not deterministic"

        # grid-padded shape (1080p-style: height not a multiple of 16):
        # pad pixels must not leak into the stats or the blur border
        odd = jnp.asarray(rng.uniform(0, 1, (1, 136, 1152, 3))
                          .astype(np.float32))
        want_odd = grade(odd, GradeConfig(**base), lut=lut,
                         ref_stats=ref_stats)
        got_odd = grade(odd, GradeConfig(**base, fused_mode="pallas"),
                        lut=lut, ref_stats=ref_stats)
        assert got_odd.shape == want_odd.shape
        err_odd = float(jnp.max(jnp.abs(got_odd - want_odd)))
        assert err_odd < 2e-5, f"odd-shape fused pallas diverged: {err_odd}"

        # elementwise adjust inside phase 1 (round 5): same stage order
        # as XLA (blend -> adjust -> stats), real-Mosaic lowering of the
        # slider chain incl. the vignette coordinate recovery
        from vrgdg_tpu.core.params import AdjustSettings
        adjust = AdjustSettings.normalize(dict(
            temperature=22.0, tint=-9.0, saturation=18.0, exposure=-12.0,
            contrast=15.0, highlights=25.0, shadows=-30.0, whites=10.0,
            blacks=-8.0, fade=12.0, vignette=35.0))
        want_adj = grade(odd, GradeConfig(**base, adjust=adjust), lut=lut,
                         ref_stats=ref_stats)
        got_adj = grade(odd, GradeConfig(**base, adjust=adjust,
                                         fused_mode="pallas"),
                        lut=lut, ref_stats=ref_stats)
        err_adj = float(jnp.max(jnp.abs(got_adj - want_adj)))
        assert err_adj < 2e-5, f"adjust fused pallas diverged: {err_adj}"

    check("fused two-phase pallas grade parity + grain + adjust on chip",
          fused_pallas_grade_parity)

    def lora_merge_full_precision():
        # The TPU default matmul (bf16 passes) measured 3.5e-2 abs error
        # on a rank-4 fold; ops/lora pins HIGHEST — assert the fold
        # stays at f32 accuracy ON CHIP (BASELINE.md round-5).
        import numpy as np

        from vrgdg_tpu.ops import lora

        rng = np.random.default_rng(11)
        weight = rng.standard_normal((256, 128)).astype(np.float32)
        down = rng.standard_normal((8, 128)).astype(np.float32)
        up = rng.standard_normal((256, 8)).astype(np.float32)
        merged = lora.merge_lora(
            {"w": jnp.asarray(weight)},
            {"w": {"down": down, "up": up, "alpha": 16.0}}, 0.7)
        want = weight + 0.7 * (16.0 / 8.0) * (up @ down)
        err = float(np.max(np.abs(np.asarray(merged["w"]) - want)))
        assert err < 1e-4, f"LoRA fold lost precision on chip: {err}"

    check("LoRA param-tree fold at full MXU precision",
          lora_merge_full_precision)

    print("[tpu_checks] ALL OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
