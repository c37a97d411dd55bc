"""Architecture pinning: trainable parameter counts must equal
torchvision's published values exactly. This validates every variant's
config tables (depths, widths, expansion ratios, SE sizes, head dims)
end to end — a mismatch anywhere changes the count. (Model pytree
leaves are exactly the trainable parameters; BN running stats live in
State, like torch buffers, and are excluded on both sides.)"""
import jax.tree_util as jtu
import pytest

from eqxvision_tpu.models import create_model

# (factory, kwargs, torchvision parameter count)
COUNTS = [
    ("alexnet", {}, 61_100_840),
    ("vgg11", {}, 132_863_336),
    ("vgg11_bn", {}, 132_868_840),
    ("resnet18", {}, 11_689_512),
    ("resnet34", {}, 21_797_672),
    ("resnet50", {}, 25_557_032),
    ("resnext50_32x4d", {}, 25_028_904),
    ("squeezenet1_0", {}, 1_248_424),
    ("squeezenet1_1", {}, 1_235_496),
    ("densenet121", {}, 7_978_856),
    ("densenet169", {}, 14_149_480),
    ("mobilenet_v2", {}, 3_504_872),
    ("mobilenet_v3_large", {}, 5_483_032),
    ("mobilenet_v3_small", {}, 2_542_856),
    ("shufflenet_v2_x0_5", {}, 1_366_792),
    ("shufflenet_v2_x1_0", {}, 2_278_604),
    ("efficientnet_b0", {}, 5_288_548),
    ("efficientnet_b1", {}, 7_794_184),
    ("efficientnet_v2_s", {}, 21_458_488),
    ("googlenet", {"aux_logits": True}, 13_004_888),
    ("convnext_tiny", {}, 28_589_128),
    ("swin_t", {}, 28_288_354),
    ("swin_v2_t", {}, 28_351_570),
    ("vit_base", {}, 86_567_656),  # timm vit_base_patch16_224
    # family-largest variants (full sweep verified once; see git log)
    ("vgg16_bn", {}, 138_365_992),
    ("resnext101_32x8d", {}, 88_791_336),
    ("wide_resnet101_2", {}, 126_886_696),
    ("shufflenet_v2_x2_0", {}, 7_393_996),
    ("efficientnet_b7", {}, 66_347_960),
    ("efficientnet_v2_l", {}, 118_515_272),
    ("regnet_x_32gf", {}, 107_811_560),
    ("regnet_y_32gf", {}, 145_046_770),
    ("convnext_large", {}, 197_767_336),
    ("swin_b", {}, 87_768_224),
    ("swin_v2_b", {}, 87_930_848),
]


@pytest.mark.parametrize("name,kwargs,expected", COUNTS, ids=[c[0] for c in COUNTS])
def test_param_count_matches_torchvision(name, kwargs, expected):
    model, _ = create_model(name, **kwargs)
    n = sum(x.size for x in jtu.tree_leaves(model) if hasattr(x, "size"))
    assert n == expected, f"{name}: {n:,} != torchvision {expected:,}"
