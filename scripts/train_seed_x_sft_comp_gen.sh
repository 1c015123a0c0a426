#!/usr/bin/env bash
# reference: scripts/train_seed_x_sft_comp_gen.sh — TPU-native launch.
# Multi-host TPU pods launch one process per host (jax.distributed
# auto-initializes from the TPU environment); no torchrun.
set -e
PROJ=$(dirname "$0")/..
python -m seedx_tpu.train.train_sft \
  --image_transform "$PROJ/configs/processer/qwen_448_transform.yaml" \
  --tokenizer "$PROJ/configs/tokenizer/clm_llama_tokenizer_224loc_anyres.yaml" \
  --visual_encoder "$PROJ/configs/visual_encoder/qwen_vitg_448.yaml" \
  --agent_model "$PROJ/configs/clm_models/agent_seed_x.yaml" \
  --train_dataset "$PROJ/configs/data/sft_comprehension_gen.yaml" \
  --output_dir runs/seed_x_sft_comp_gen \
  --learning_rate 1e-4 --weight_decay 0.05 \
  --max_steps 20000 --warmup_steps 500 --min_lr_ratio 0.05 \
  --save_steps 1000 "$@"
