#!/bin/bash
# Stage-C geometric escalation, two-phase (see configs/augs_geometric_warm.yaml
# header for why the single-shot recipe failed): C1 learns geometry with a
# strong watermark and no perceptual pressure; C2 restores the full pool +
# yuv perceptual + discriminator and anneals scaling_w back down to recover
# psnr >= 38. Finishes with the full robustness sweep.
set -e
cd /root/repo
R=outputs/convergence_r4

echo "=== Stage C1: geometric warm-up (strong watermark) ===" | tee -a $R/chain.log
python -m videoseal_tpu.train --card videoseal_1.0 --nbits 32 \
    --img_size 128 --synthetic 1 --steps 14000 --batch_size 32 \
    --num_augs 1 --lambda_d 0 --lambda_i 0 --perceptual_loss none \
    --scaling_w 1.0 \
    --optimizer "AdamW,lr=2e-4" \
    --scheduler "CosineLRScheduler,lr_min=1e-6,t_initial=14,warmup_t=1" \
    --augmentation_config videoseal_tpu/configs/augs_geometric_warm.yaml \
    --resume $R/stageB/checkpoint.npz \
    --eval_freq 2 --eval_augs geometric \
    --output_dir $R/stageC1 >> $R/chain.log 2>&1

echo "=== Stage C2: polish (full pool + disc + perceptual) ===" | tee -a $R/chain.log
python -m videoseal_tpu.train --card videoseal_1.0 --nbits 32 \
    --img_size 128 --synthetic 1 --steps 14000 --batch_size 32 \
    --num_augs 2 --lambda_d 0.1 --lambda_i 0.1 --perceptual_loss yuv \
    --disc_start 10000 --scaling_w 1.0 \
    --scaling_w_schedule "Cosine,scaling_min=0.6,start_epoch=2,epochs=10" \
    --optimizer "AdamW,lr=1e-4" \
    --scheduler "CosineLRScheduler,lr_min=1e-6,t_initial=100,warmup_t=2" \
    --augmentation_config videoseal_tpu/configs/augs_geometric.yaml \
    --resume $R/stageC1/checkpoint.npz \
    --eval_freq 2 --eval_augs geometric \
    --output_dir $R/stageC2 >> $R/chain.log 2>&1

echo "=== Final robustness sweep ===" | tee -a $R/chain.log
python -m videoseal_tpu.tools.eval_checkpoint \
    --checkpoint $R/stageC2/checkpoint.npz \
    --card videoseal_1.0 --nbits 32 --img_size 128 --scaling_w 0.6 \
    --samples 8 --out_csv $R/stageC2/metrics.csv >> $R/chain.log 2>&1
echo "=== stage C done ===" | tee -a $R/chain.log
