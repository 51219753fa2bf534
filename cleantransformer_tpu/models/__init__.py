from cleantransformer_tpu.models.gpt import GPTModel, GPTLMHeadModel  # noqa: F401
from cleantransformer_tpu.models.bert import BertModel, BertForSequenceClassification  # noqa: F401
from cleantransformer_tpu.models.bloom import BloomModel, BloomForCausalLM  # noqa: F401
from cleantransformer_tpu.models.llama import LlamaModel, LlamaForCausalLM  # noqa: F401
