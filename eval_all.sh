#!/bin/bash
# Evaluate all models on the Robust MVD Benchmark
# (reference parity: /root/reference/eval_all.sh — GPU selection becomes a
# no-op; device use is mesh-based on TPU).

OUT_BASE=${1:-"./eval_out"}
shift || true

num_samples=""
eval_uncertainty=""

echo "Writing benchmark outputs to ${OUT_BASE}"

# robust_mvd model:
python eval.py --eval_type robustmvd --model robust_mvd --inputs poses intrinsics \
    --output ${OUT_BASE}/robust_mvd \
    --eth3d_size 768 1152 --kitti_size 384 1280 --dtu_size 896 1216 \
    --scannet_size 448 640 --tanks_and_temples_size 704 1280 ${num_samples} ${eval_uncertainty}

# robust_mvd_5M model:
python eval.py --eval_type robustmvd --model robust_mvd_5M --inputs poses intrinsics \
    --output ${OUT_BASE}/robust_mvd_5M \
    --eth3d_size 768 1152 --kitti_size 384 1280 --dtu_size 896 1216 \
    --scannet_size 448 640 --tanks_and_temples_size 704 1280 ${num_samples} ${eval_uncertainty}

# monodepth2 wrapped models (single-view; median alignment):
python eval.py --eval_type robustmvd --model monodepth2_mono_stereo_1024x320_wrapped \
    --output ${OUT_BASE}/monodepth2_mono_stereo_1024x320_wrapped \
    --max_source_views 0 --alignment median ${num_samples}
python eval.py --eval_type robustmvd --model monodepth2_mono_stereo_640x192_wrapped \
    --output ${OUT_BASE}/monodepth2_mono_stereo_640x192_wrapped \
    --max_source_views 0 --alignment median ${num_samples}

# midas wrapped model (single-view inverse depth; scale-shift alignment):
python eval.py --eval_type robustmvd --model midas_big_v2_1_wrapped \
    --output ${OUT_BASE}/midas_big_v2_1_wrapped \
    --max_source_views 0 --alignment least_squares_scale_shift ${num_samples}

# vis_mvsnet model (known / unknown depth range):
python eval.py --eval_type robustmvd --model vis_mvsnet --inputs poses intrinsics depth_range \
    --output ${OUT_BASE}/vis_mvsnet/known_depth_range --eval_name known_depth_range \
    --eth3d_size 768 1152 --kitti_size 384 1280 --dtu_size 896 1216 \
    --scannet_size 448 640 --tanks_and_temples_size 704 1280 ${num_samples} ${eval_uncertainty}
python eval.py --eval_type robustmvd --model vis_mvsnet --inputs poses intrinsics \
    --output ${OUT_BASE}/vis_mvsnet/unknown_depth_range --eval_name unknown_depth_range \
    --eth3d_size 768 1152 --kitti_size 384 1280 --dtu_size 896 1216 \
    --scannet_size 448 640 --tanks_and_temples_size 704 1280 ${num_samples} ${eval_uncertainty}

# cvp_mvsnet model (needs >= 2 source views, nearest ordering):
python eval.py --eval_type robustmvd --model cvp_mvsnet --inputs poses intrinsics depth_range \
    --output ${OUT_BASE}/cvp_mvsnet --view_ordering nearest --min_source_views 2 \
    --eth3d_size 768 1152 --kitti_size 384 1280 --dtu_size 896 1216 \
    --scannet_size 448 640 --tanks_and_temples_size 704 1280 ${num_samples} ${eval_uncertainty}
