from posediffusion_tpu.matching.convert import convert_superglue, convert_superpoint
from posediffusion_tpu.matching.extract import extract_match, load_matcher_weights
from posediffusion_tpu.matching.ransac import verify_matches, verify_two_view
from posediffusion_tpu.matching.superglue import SuperGlueNet, log_sinkhorn, match_pair
from posediffusion_tpu.matching.superpoint import (
    SuperPointNet,
    detect_keypoints,
    simple_nms,
)
