#!/bin/bash
# Round-4 convergence chain: Stage A (identity warm start) -> Stage B (full
# attack stack + disc) -> Stage C (geometric escalation) -> robustness sweep.
# Re-runs the round-2-proven recipe end to end (checkpoints are not kept
# between rounds) and finishes with the Stage-C bar the round-3 outage
# blocked: Rotate/Crop/Perspective mean bit_acc >= 0.90 at psnr >= 38.
# Recipes: docs/training.md.
set -e
cd /root/repo
R=outputs/convergence_r4
mkdir -p $R

echo "=== Stage A: identity warm start ===" | tee -a $R/chain.log
python -m videoseal_tpu.train --card videoseal_1.0 --nbits 32 \
    --img_size 128 --synthetic 1 --steps 15000 --batch_size 32 \
    --num_augs 1 --lambda_d 0 --lambda_i 0 --perceptual_loss none \
    --scaling_w 1.0 --optimizer "AdamW,lr=5e-4" \
    --scheduler "CosineLRScheduler,lr_min=1e-6,t_initial=15,warmup_t=1" \
    --augmentation_config videoseal_tpu/configs/augs_identity.yaml \
    --eval_freq 0 \
    --output_dir $R/stageA >> $R/chain.log 2>&1

echo "=== Stage B: full attack stack + discriminator ===" | tee -a $R/chain.log
python -m videoseal_tpu.train --card videoseal_1.0 --nbits 32 \
    --img_size 128 --synthetic 1 --steps 12000 --batch_size 32 \
    --num_augs 2 --lambda_d 0.1 --lambda_i 0.1 --perceptual_loss yuv \
    --disc_start 11000 --scaling_w 1.0 \
    --scaling_w_schedule "Cosine,scaling_min=0.4,start_epoch=25,epochs=50" \
    --optimizer "AdamW,lr=2e-4" \
    --scheduler "CosineLRScheduler,lr_min=1e-6,t_initial=100,warmup_t=2" \
    --resume $R/stageA/checkpoint.npz \
    --eval_freq 0 \
    --output_dir $R/stageB >> $R/chain.log 2>&1

echo "=== Stage C: geometric escalation ===" | tee -a $R/chain.log
python -m videoseal_tpu.train --card videoseal_1.0 --nbits 32 \
    --img_size 128 --synthetic 1 --steps 30000 --batch_size 32 \
    --num_augs 2 --lambda_d 0.1 --lambda_i 0.1 --perceptual_loss yuv \
    --disc_start 0 --scaling_w 0.5 \
    --optimizer "AdamW,lr=1e-4" \
    --scheduler "CosineLRScheduler,lr_min=1e-6,t_initial=30,warmup_t=1" \
    --augmentation_config videoseal_tpu/configs/augs_geometric.yaml \
    --resume $R/stageB/checkpoint.npz \
    --eval_freq 2 --eval_augs geometric \
    --output_dir $R/stageC >> $R/chain.log 2>&1

echo "=== Final robustness sweep ===" | tee -a $R/chain.log
python -m videoseal_tpu.tools.eval_checkpoint \
    --checkpoint $R/stageC/checkpoint.npz \
    --card videoseal_1.0 --nbits 32 --img_size 128 --scaling_w 0.5 \
    --samples 8 --out_csv $R/stageC/metrics.csv >> $R/chain.log 2>&1
echo "=== chain done ===" | tee -a $R/chain.log
