"""end2end_tpu — TPU-native CTC losses and decoders for end-to-end ASR/OCR.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the reference
`artbataev/end2end` library (see SURVEY.md for the full blueprint).  Public
API mirrors the reference (BASELINE.json):

    ctc_loss(log_probs, targets, input_lengths, target_lengths, ...)
    greedy_decode(log_probs, input_lengths, ...)
    beam_search_decode(log_probs, input_lengths, ...)

plus module-style wrappers CTCLoss / GreedyCTCDecoder / BeamSearchCTCDecoder.
"""

from .ops.alignment import ForcedAlignment, ctc_forced_alignment
from .ops.ctc_loss import CTCLoss, ctc_loss, ctc_loss_jit, ctc_nll
from .ops.greedy import GreedyCTCDecoder, greedy_decode, greedy_decode_with_timestamps
from .ops.beam_search import BeamSearchCTCDecoder, beam_search_decode
from .ops.beam_chunked import beam_search_chunked_lm
from .ops.confidence import (
    aggregate_confidence,
    frame_confidence,
    greedy_decode_with_confidence,
    rnnt_greedy_decode_with_confidence,
    rnnt_token_confidence,
    token_confidence,
    word_confidences,
)
from .ops.lm import (
    CompositeLM,
    HashedNGramLM,
    HashedWordNGramLM,
    HotwordBoostLM,
    NGramLM,
    QuantizedBigramGuide,
    WordNGramLM,
)
from .ops.mwer import mwer_loss, mwer_loss_from_nbest, rnnt_mwer_loss
from .ops.neural_lm import NeuralLM
from .ops.rescore import rescore_nbest
from .ops.rnnt_decode import (FactoredAdditiveJoint, additive_joint,
                              rnnt_beam_decode, rnnt_greedy_decode)
from .ops.rnnt_loss import (RNNTLoss, fused_additive_joint,
                            rnnt_loss, rnnt_loss_fused, rnnt_nll,
                            rnnt_nll_from_planes, rnnt_nll_fused)
from .ops.streaming_decode import (StreamingBeamDecoder,
                                       StreamingGreedyDecoder,
                                       StreamingRNNTBeamDecoder,
                                       StreamingRNNTGreedyDecoder)
from .utils.lm_train import (
    train_ngram_arpa,
    train_ngram_lm,
    word_lm_from_corpus,
)

__version__ = "0.2.0"

__all__ = [
    "ctc_loss",
    "ctc_loss_jit",
    "ctc_nll",
    "CTCLoss",
    "greedy_decode",
    "greedy_decode_with_timestamps",
    "greedy_decode_with_confidence",
    "rnnt_greedy_decode_with_confidence",
    "rnnt_token_confidence",
    "frame_confidence",
    "token_confidence",
    "aggregate_confidence",
    "word_confidences",
    "GreedyCTCDecoder",
    "beam_search_decode",
    "beam_search_chunked_lm",
    "BeamSearchCTCDecoder",
    "ctc_forced_alignment",
    "ForcedAlignment",
    "NGramLM",
    "QuantizedBigramGuide",
    "WordNGramLM",
    "HashedNGramLM",
    "HashedWordNGramLM",
    "HotwordBoostLM",
    "CompositeLM",
    "NeuralLM",
    "mwer_loss",
    "rnnt_mwer_loss",
    "mwer_loss_from_nbest",
    "rnnt_loss",
    "rnnt_nll",
    "rnnt_nll_fused",
    "rnnt_loss_fused",
    "rnnt_nll_from_planes",
    "fused_additive_joint",
    "RNNTLoss",
    "rnnt_greedy_decode",
    "rnnt_beam_decode",
    "additive_joint",
    "FactoredAdditiveJoint",
    "rescore_nbest",
    "train_ngram_lm",
    "train_ngram_arpa",
    "word_lm_from_corpus",
    "StreamingGreedyDecoder",
    "StreamingBeamDecoder",
    "StreamingRNNTBeamDecoder",
    "StreamingRNNTGreedyDecoder",
    "__version__",
]
