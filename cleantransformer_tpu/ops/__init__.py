from cleantransformer_tpu.ops.layers import layer_norm, linear  # noqa: F401
from cleantransformer_tpu.ops.activations import ACT2FN, gelu, gelu_new, bloom_gelu, relu  # noqa: F401
from cleantransformer_tpu.ops.losses import (  # noqa: F401
    mse_loss, cross_entropy_loss, log_softmax, nll_loss, shift_cross_entropy_loss,
)
from cleantransformer_tpu.ops.attention import multi_head_attention, dense_attention  # noqa: F401
