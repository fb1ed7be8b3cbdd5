"""Finetune driver CLI.

Mirrors the reference launch surface (Vidi1.5_9B/vidi/train/train.py +
scripts/finetune.sh) on the TPU stack: GSPMD mesh instead of deepspeed,
optax param groups instead of the 8 HF optimizer groups, orbax save/resume.

    python -m vidi_tpu.train.train --tiny --data_path synthetic --max_steps 2
    python -m vidi_tpu.train.train --model_path CKPT --data_path example.json \
        --video_folder /data --output_dir out/
"""
from __future__ import annotations

import argparse
import json
import os

import numpy as np
import jax
import jax.numpy as jnp

from vidi_tpu.core.mesh import make_mesh
from vidi_tpu.parallel import sharding
from vidi_tpu.train import data as data_mod
from vidi_tpu.train.checkpoint import Checkpointer
from vidi_tpu.train.optimizer import TrainHParams, make_optimizer
from vidi_tpu.train.train_step import make_batch_hw, opt_init, train_step


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--model_path", type=str, default=None,
                   help="full Vidi checkpoint, or (with --mm_vision_tower) a "
                        "plain Gemma2/Mistral HF checkpoint to assemble from")
    p.add_argument("--tiny", action="store_true", help="random tiny model")
    # Model assembly (reference ModelArguments, train.py:37-58): start from a
    # base LLM + tower checkpoints; mm_rand_* adapters initialize fresh.
    p.add_argument("--mm_vision_tower", type=str, default=None,
                   help="vision tower checkpoint dir (e.g. a local "
                        "siglip2-so400m-patch14-384); triggers assembly")
    p.add_argument("--mm_audio_tower", type=str, default=None,
                   help="audio tower checkpoint dir (whisper-large-v3)")
    p.add_argument("--mm_std", type=float, default=None,
                   help="init scale of mm_rand_llm_norm (finetune.sh:27)")
    p.add_argument("--mm_image_pool_size", type=int, default=None)
    p.add_argument("--mm_audio_pool_size", type=int, default=None)
    p.add_argument("--mm_time_interval", type=int, default=None)
    p.add_argument("--mm_input_type", choices=["video", "image"], default=None)
    p.add_argument("--mm_image_aspect_ratio",
                   choices=["pad", "resize", "anyres", "crop"], default=None)
    p.add_argument("--model_max_length", type=int, default=None)
    p.add_argument("--data_path", type=str, required=True,
                   help="conversation JSON, or 'synthetic'")
    p.add_argument("--dataset_type", choices=["video-conv", "image-conv"],
                   default="video-conv",
                   help="reference DataArguments.dataset_type")
    p.add_argument("--video_folder", type=str, default=".")
    p.add_argument("--image_folder", type=str, default=None,
                   help="image root for --dataset_type image-conv")
    p.add_argument("--output_dir", type=str, default="checkpoint/run")
    p.add_argument("--max_steps", type=int, default=100)
    p.add_argument("--per_device_train_batch_size", type=int, default=1)
    p.add_argument("--gradient_accumulation_steps", type=int, default=1)
    p.add_argument("--group_by_length", action="store_true",
                   help="modality-aware length-grouped batching "
                        "(SPLengthGroupedSampler semantics)")
    p.add_argument("--pack", action="store_true",
                   help="pack text-only conversations into dense rows with "
                        "segment-id block-diagonal attention")
    p.add_argument("--pack_seq_len", type=int, default=None,
                   help="packed row length (default model_max_length)")
    p.add_argument("--profile_dir", type=str, default=None,
                   help="write a jax.profiler trace of steps 2-4 here")
    p.add_argument("--use_flash", action="store_true",
                   help="Pallas flash-attention kernels in the forward pass")
    p.add_argument("--remat", choices=["full", "dots", "none"],
                   default="full",
                   help="gradient checkpointing of the decoder layer scan: "
                        "full recompute (reference gradient_checkpointing), "
                        "'dots' saves matmul outputs and recomputes only "
                        "elementwise ops (faster, more memory), 'none' "
                        "saves everything")
    p.add_argument("--sp_mode", choices=["gspmd", "ring", "ulysses"],
                   default="gspmd",
                   help="sequence parallelism for the modality cross-attn: "
                        "GSPMD annotations, explicit ring attention, or the "
                        "reference's explicit Ulysses head-reshard plan "
                        "(ulysses_attn.py:165-207) via all-to-all")
    p.add_argument("--learning_rate", type=float, default=1e-5)
    p.add_argument("--mm_rand_lr", type=float, default=2e-5)
    # per-module tower LRs (reference TrainingArguments mm_vis_lr/mm_aud_lr,
    # train.py:75-89); None = base learning_rate
    p.add_argument("--mm_vis_lr", type=float, default=None)
    p.add_argument("--mm_aud_lr", type=float, default=None)
    p.add_argument("--weight_decay", type=float, default=0.1)
    p.add_argument("--warmup_ratio", type=float, default=0.03)
    p.add_argument("--train_rand", type=lambda s: s == "true", default=True)
    p.add_argument("--train_vis", type=lambda s: s == "true", default=False)
    p.add_argument("--train_aud", type=lambda s: s == "true", default=False)
    p.add_argument("--train_llm", type=lambda s: s == "true", default=True)
    p.add_argument("--loss_thres", type=float, default=0.1)
    p.add_argument("--mm_splits", type=int, default=4)
    p.add_argument("--save_steps", type=int, default=1000)
    p.add_argument("--save_total_limit", type=int, default=2)
    p.add_argument("--video_fps", type=float, default=1.0)
    p.add_argument("--seed", type=int, default=45678)
    p.add_argument("--seq_parallel_size", type=int, default=1)
    p.add_argument("--model_parallel_size", type=int, default=1)
    p.add_argument("--report_to", choices=["none", "tensorboard"],
                   default="none",
                   help="metric sink beyond metrics.jsonl (reference "
                        "finetune.sh:50-51 'report_to tensorboard'); events "
                        "land in <output_dir>/runs")
    p.add_argument("--export_hf", type=str, default=None, metavar="DIR",
                   help="after training, also export HF-format safetensors + "
                        "config.json to DIR (reference train.py:92-106 saves "
                        "HF-compatible weights; loadable via --model-path)")
    return p.parse_args()


def main():
    from vidi_tpu.core.compile_cache import setup_compile_cache
    setup_compile_cache()
    args = parse_args()
    from vidi_tpu.infer.loader import load_model

    mm_overrides = {
        "mm_std": args.mm_std,
        "mm_image_pool_size": args.mm_image_pool_size,
        "mm_audio_pool_size": args.mm_audio_pool_size,
        "mm_time_interval": args.mm_time_interval,
        "mm_input_type": args.mm_input_type,
        "mm_image_aspect_ratio": args.mm_image_aspect_ratio,
        "model_max_length": args.model_max_length,
    }
    params, cfg, tokenizer = load_model(
        args.model_path, "tiny" if args.tiny else None,
        mm_vision_tower=args.mm_vision_tower,
        mm_audio_tower=args.mm_audio_tower, mm_overrides=mm_overrides)
    import dataclasses
    cfg = dataclasses.replace(cfg, loss_thres=args.loss_thres)

    n_dev = jax.device_count()
    mesh = make_mesh(jax.devices(), seq=args.seq_parallel_size,
                     model=args.model_parallel_size)
    hp = TrainHParams(
        learning_rate=args.learning_rate, mm_rand_lr=args.mm_rand_lr,
        mm_vis_lr=args.mm_vis_lr, mm_aud_lr=args.mm_aud_lr,
        weight_decay=args.weight_decay, warmup_ratio=args.warmup_ratio,
        total_steps=args.max_steps, train_rand=args.train_rand,
        train_vis=args.train_vis, train_aud=args.train_aud,
        train_llm=args.train_llm)
    tx = make_optimizer(params, hp)
    # stop-gradient frozen modules so their backward is dropped from the
    # graph (reference towers run under set_grad_enabled(False))
    frozen = tuple(mod for flag, mod in (
        (args.train_llm, "text"), (args.train_vis, "vision"),
        (args.train_aud, "audio"), (args.train_rand, "mm")) if not flag)
    if args.gradient_accumulation_steps > 1:
        # ZeRO-style accumulation: grads accumulate in optimizer state,
        # params step every GA micro-batches (finetune.sh GA arithmetic)
        import optax
        tx = optax.MultiSteps(tx, args.gradient_accumulation_steps)

    with sharding.use_mesh(mesh):
        params = sharding.shard_params(params, mesh)
        opt_state = opt_init(tx, params)

        ckpt = Checkpointer(args.output_dir, args.save_total_limit)
        start_step = 0
        if ckpt.latest_step() is not None:  # auto-resume (train.py:206-208)
            start_step, params_r, opt_r = ckpt.restore(params, opt_state)
            # restore can land arrays on one device; re-place onto the mesh
            params = sharding.shard_params(params_r, mesh)
            opt_state = sharding.shard_params(opt_r, mesh)
            print(f"resumed from step {start_step}")

        synthetic = args.data_path == "synthetic"
        image_ds = args.dataset_type == "image-conv"
        if image_ds:
            assert cfg.mm_input_type == "image", (
                "--dataset_type image-conv needs an image-mode model "
                "(--mm_input_type image, or an image-type checkpoint); "
                f"got mm_input_type={cfg.mm_input_type!r}")
            # anyres: per-sample (gw, gh) grids ride the batch as a traced
            # "grids" array (collate_images), so any batch size / grid mix
            # shares one compile per tile-count bucket
            assert not args.pack, "--pack is for text/video-conv data"
        else:
            assert cfg.mm_input_type == "video", (
                "video-conv data needs a video-mode model; got "
                f"mm_input_type={cfg.mm_input_type!r} (pass --dataset_type "
                "image-conv for image models)")
        if not synthetic:
            if image_ds:
                ds = data_mod.ImageConvDataset(
                    args.data_path, args.image_folder or args.video_folder,
                    tokenizer, cfg)
            else:
                ds = data_mod.VideoConvDataset(
                    args.data_path, args.video_folder, tokenizer, cfg,
                    fps=args.video_fps)
            if args.group_by_length:
                from vidi_tpu.train.samplers import length_grouped_epoch_indices
                order = length_grouped_epoch_indices(
                    ds.lengths, args.per_device_train_batch_size,
                    world_size=n_dev,
                    grad_accum=args.gradient_accumulation_steps,
                    sp_size=1, dp_size=1, seed=args.seed)
                order = np.asarray(order)
            else:
                order = np.random.default_rng(args.seed).permutation(len(ds))

        from vidi_tpu.utils import StepMeter, build_logger
        meter = StepMeter()
        logger = build_logger("vidi_tpu.train", "train.log",
                              log_dir=os.path.join(args.output_dir, "logs"))
        metrics_path = os.path.join(args.output_dir, "metrics.jsonl")
        os.makedirs(args.output_dir, exist_ok=True)
        metrics_f = open(metrics_path, "a")
        from vidi_tpu.train.optimizer import lr_schedule
        from vidi_tpu.train.tb import TBReporter
        tb = TBReporter(args.output_dir, enabled=args.report_to == "tensorboard")
        # every configured param group steps its own cosine (the reference's
        # 8 optimizer groups carry mm_rand/vis/aud LRs, vidi_trainer.py:146)
        lr_fns = {"learning_rate": lr_schedule(hp, hp.learning_rate),
                  "learning_rate_mm_rand": lr_schedule(
                      hp, hp.mm_rand_lr or hp.learning_rate)}
        if hp.mm_vis_lr is not None:
            lr_fns["learning_rate_mm_vis"] = lr_schedule(hp, hp.mm_vis_lr)
        if hp.mm_aud_lr is not None:
            lr_fns["learning_rate_mm_aud"] = lr_schedule(hp, hp.mm_aud_lr)
        rng = jax.random.PRNGKey(args.seed)
        bsz = args.per_device_train_batch_size * mesh.devices.shape[0]
        def batch_source():
            """Host-side batch prep (video decode + collate), run on the
            prefetch thread so it overlaps the device's current step (the
            reference's dataloader_num_workers analog, finetune.sh:52)."""
            pack_cursor = 0
            packer = None
            for step in range(start_step, args.max_steps):
                grid = None
                if synthetic:
                    batch = (data_mod.synthetic_image_batch(cfg, b=bsz, seed=step)
                             if image_ds
                             else data_mod.synthetic_batch(cfg, b=bsz, seed=step))
                elif args.pack:
                    # stream samples into the packer until a batch flushes
                    from vidi_tpu.train.packing import PackedBatcher
                    if packer is None:
                        packer = PackedBatcher(cfg, bsz, args.pack_seq_len)
                    batch = None
                    while batch is None:
                        i = int(order[pack_cursor % len(order)])
                        pack_cursor += 1
                        batch = packer.add(ds[i])
                else:
                    idx = [int(order[(step * bsz + j) % len(order)])
                           for j in range(bsz)]
                    collate = (data_mod.collate_images if image_ds
                               else data_mod.collate)
                    samples = [ds[i] for i in idx]
                    batch = collate(samples, cfg)
                    # anyres grids travel inside the batch ("grids" [B, 2],
                    # collate_images) — no static per-grid recompiles
                if "frame_counts" in batch:
                    # token budget counts REAL frames (reference
                    # multimodal.py:175 concatenates actual frames), not the
                    # padded bucket
                    hw = make_batch_hw(cfg, max(int(batch["frame_counts"].sum()), 1))
                    n_tokens = int(batch["text_mask"].sum()) + int(
                        batch["frame_counts"].sum()) * (hw[0] // cfg.mm_image_pool_size) ** 2
                else:
                    hw = make_batch_hw(cfg, 1)  # static placeholder (unused)
                    s2 = cfg.vision.num_patches_per_side ** 2
                    has_img = (np.abs(batch["images"]).reshape(
                        len(batch["images"]), -1).sum(axis=1) > 0)
                    n_tokens = int(batch["text_mask"].sum()) + int(
                        has_img.sum()) * s2
                yield batch, hw, n_tokens, grid

        from vidi_tpu.train.prefetch import Prefetcher
        batches = iter(Prefetcher(batch_source(), depth=2))
        for step in range(start_step, args.max_steps):
            if args.profile_dir and step == start_step + 2:
                jax.profiler.start_trace(args.profile_dir)
            meter.start()
            # instant when the prefetch thread kept up; any wait here means
            # the run is host-decode-bound and is counted in the step time
            batch, hw, n_tokens, grid = next(batches)
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
            rng, sub = jax.random.split(rng)
            params, opt_state, loss = train_step(
                params, opt_state, batch, sub, cfg=cfg, tx=tx, hw=hw,
                mm_chunks=args.mm_splits, use_flash=args.use_flash,
                remat={"full": True, "dots": "dots", "none": False}[args.remat],
                sp_mode=args.sp_mode, frozen=frozen, grid_shape=grid)
            loss = float(jax.device_get(loss))
            dt = meter.stop(n_tokens)
            logger.info(f"step {step}  loss {loss:.4f}  {dt:.2f}s  "
                        f"[{meter.summary()}]  (devices={n_dev})")
            # under MultiSteps the inner schedules advance once per GA
            # micro-steps — report the LRs actually applied to the weights
            opt_step = step // args.gradient_accumulation_steps
            lrs = {k: float(fn(opt_step)) for k, fn in lr_fns.items()}
            metrics_f.write(json.dumps({
                "step": step, "loss": loss, "step_time_s": round(dt, 4),
                "tokens_per_sec": round(meter.tokens_per_sec, 1),
                "learning_rate": lrs["learning_rate"]}) + "\n")
            metrics_f.flush()
            tb.report({"loss": loss, **lrs, "step_time_s": dt,
                       "tokens_per_sec": meter.tokens_per_sec}, step)
            if args.profile_dir and step == start_step + 4:
                jax.profiler.stop_trace()
            if (step + 1) % args.save_steps == 0 or step + 1 == args.max_steps:
                ckpt.save(step + 1, params, opt_state)
        ckpt.close()
        metrics_f.close()
        tb.close()
        if args.export_hf:
            from vidi_tpu.infer.export import save_pretrained
            host_params = jax.device_get(params)
            save_pretrained(host_params, cfg, args.export_hf,
                            tokenizer_src=args.model_path)
            print(f"exported HF checkpoint to {args.export_hf}")
        print("training done")


if __name__ == "__main__":
    main()
