from cleantransformer_tpu.utils.hf_loader import (  # noqa: F401
    load_state_dict, gpt_params_from_state_dict, bloom_params_from_state_dict,
    bert_params_from_state_dict,
)
