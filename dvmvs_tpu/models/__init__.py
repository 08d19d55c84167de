from dvmvs_tpu.models.pairnet import PairNet
from dvmvs_tpu.models.fusionnet import FusionNet, init_lstm_carry
