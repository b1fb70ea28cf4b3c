from evoke_tpu.models.resnet import ResNet101, VisualExtractor
from evoke_tpu.models.text_encoder import TextEncoder
from evoke_tpu.models.rm_decoder import RMDecoder
from evoke_tpu.models.pretrain import PretrainModel
from evoke_tpu.models.finetune import FinetuneModel
