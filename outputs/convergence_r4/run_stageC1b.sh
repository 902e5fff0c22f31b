#!/bin/bash
# Stage-C1b: continue the geometric warm-up (resume C1) — the C1 trajectory
# (eval.jsonl) was still climbing at 14k steps; psnr at scaling_w 1.0 sits
# at ~47 dB (JND-capped), already above the >=38 bar, so more warm-up is
# strictly better and the disc polish (C2) is optional for the bar.
# Then the flagship-scale trajectory run (256-bit, 256 px, identity pool):
# shows bit-acc developing at the real model scale (VERDICT r3 item 7).
set -e
cd /root/repo
R=outputs/convergence_r4

echo "=== Stage C1b: geometric warm-up continuation ===" | tee -a $R/chain.log
python -m videoseal_tpu.train --card videoseal_1.0 --nbits 32 \
    --img_size 128 --synthetic 1 --steps 26000 --batch_size 32 \
    --num_augs 1 --lambda_d 0 --lambda_i 0 --perceptual_loss none \
    --scaling_w 1.0 --optimizer "AdamW,lr=3e-4" \
    --scheduler "CosineLRScheduler,lr_min=1e-6,t_initial=26,warmup_t=1" \
    --augmentation_config videoseal_tpu/configs/augs_geometric_warm.yaml \
    --resume $R/stageC1/checkpoint.npz \
    --eval_freq 2 --eval_augs geometric \
    --output_dir $R/stageC1b >> $R/chain.log 2>&1

echo "=== Final robustness sweep (C1b) ===" | tee -a $R/chain.log
python -m videoseal_tpu.tools.eval_checkpoint \
    --checkpoint $R/stageC1b/checkpoint.npz \
    --card videoseal_1.0 --nbits 32 --img_size 128 --scaling_w 1.0 \
    --samples 8 --out_csv $R/stageC1b/metrics.csv >> $R/chain.log 2>&1

echo "=== Flagship-scale trajectory (256-bit, 256px) ===" | tee -a $R/chain.log
python -m videoseal_tpu.train --card videoseal_1.0 \
    --img_size 256 --synthetic 1 --steps 3000 --batch_size 32 \
    --num_augs 1 --lambda_d 0 --lambda_i 0 --perceptual_loss none \
    --scaling_w 1.0 --optimizer "AdamW,lr=5e-4" \
    --scheduler "CosineLRScheduler,lr_min=1e-6,t_initial=3,warmup_t=1" \
    --augmentation_config videoseal_tpu/configs/augs_identity.yaml \
    --eval_freq 1 --eval_augs identity --eval_samples 4 \
    --output_dir $R/flagship_traj >> $R/chain.log 2>&1
echo "=== C1b chain done ===" | tee -a $R/chain.log
