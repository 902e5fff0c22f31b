#!/bin/bash
# Round-5 chain, part 2 (relaunch). The first C2 launch collapsed the
# watermark (bit_acc 0.99->0.52 in 4k steps, psnr 39->46) for two reasons
# recorded in chain.log / stageC2_botched:
#   1. --disc_start is compared against the RESTORED global step (the C1c
#      checkpoint carries step=97000 accumulated across the whole r2->r5
#      stage chain), so the intended 10k-step disc warm-up gate was already
#      elapsed at launch.
#   2. --resume also restores disc_params from the checkpoint: a STALE disc
#      trained in an earlier GAN stage is instantly confident against the
#      resumed 39 dB watermark (step-0 logits_fake = -13.8) and the hinge-G
#      gradient (static scale 0.1 * 13.8 vs decode 0.023) crushes the
#      message.
# Fixes: --disc_start 107000 (absolute: 97000 + 10k warm-up) and the new
# --reset_disc 1 (fresh disc + disc opt state on resume) so G-gate and a
# SCRATCH disc activate together, the configuration that worked in the
# round-2 stage-B GAN phase.
set -e
cd /root/repo
R=outputs/convergence_r5

echo "=== Stage C2 (relaunch): polish (full pool + disc + perceptual) ===" | tee -a $R/chain.log
python -m videoseal_tpu.train --card videoseal_1.0 --nbits 32 \
    --img_size 128 --synthetic 1 --steps 14000 --batch_size 32 \
    --num_augs 2 --lambda_d 0.1 --lambda_i 0.1 --perceptual_loss yuv \
    --disc_start 107000 --reset_disc 1 --scaling_w 1.0 \
    --scaling_w_schedule "Cosine,scaling_min=0.6,start_epoch=2,epochs=10" \
    --optimizer "AdamW,lr=1e-4" \
    --scheduler "CosineLRScheduler,lr_min=1e-6,t_initial=100,warmup_t=2" \
    --augmentation_config videoseal_tpu/configs/augs_geometric.yaml \
    --resume $R/stageC1c/checkpoint.npz \
    --eval_freq 2 --eval_augs geometric \
    --output_dir $R/stageC2 >> $R/chain.log 2>&1

echo "=== Final robustness sweep (C2) ===" | tee -a $R/chain.log
python -m videoseal_tpu.tools.eval_checkpoint \
    --checkpoint $R/stageC2/checkpoint.npz \
    --card videoseal_1.0 --nbits 32 --img_size 128 --scaling_w 1.0 \
    --samples 8 --out_csv $R/stageC2/metrics.csv >> $R/chain.log 2>&1

echo "=== Flagship-scale trajectory (256-bit, 256px) ===" | tee -a $R/chain.log
python -m videoseal_tpu.train --card videoseal_1.0 \
    --img_size 256 --synthetic 1 --steps 3000 --batch_size 16 \
    --num_augs 1 --lambda_d 0 --lambda_i 0 --perceptual_loss none \
    --scaling_w 1.0 --optimizer "AdamW,lr=5e-4" \
    --scheduler "CosineLRScheduler,lr_min=1e-6,t_initial=3,warmup_t=1" \
    --augmentation_config videoseal_tpu/configs/augs_identity.yaml \
    --eval_freq 1 --eval_augs identity --eval_samples 4 \
    --output_dir $R/flagship_traj >> $R/chain.log 2>&1
echo "=== round-5 chain part 2 done ===" | tee -a $R/chain.log
