from cleantransformer_tpu.generation.logits_process import (  # noqa: F401
    no_repeat_ngram, temperature_wrap, top_k_wrap, top_p_wrap, build_wrapper_chain,
)
from cleantransformer_tpu.generation.engine import generate, bind_generation  # noqa: F401
from cleantransformer_tpu.generation.streamer import ConsoleSteamer, ConsoleStreamer  # noqa: F401
