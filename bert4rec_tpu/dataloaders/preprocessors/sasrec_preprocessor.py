"""SASRec feature preprocessor (BEYOND PARITY — no reference counterpart).

Identical tokenize/truncate/pad machinery to :class:`BERT4RecPreprocessor`;
the produced :class:`ProcessedDataset` runs the ``"next_item"`` task instead
of dynamic MLM masking: the final item is dropped from the model input and
every remaining position predicts its successor (finetuning rows predict
only the held-out last item — the leave-one-out eval protocol). The emitted
feature dict keeps the exact ``masked_lm_*`` contract, so trainers,
evaluators and apps consume it unchanged.

Inference keeps the parent's append-a-placeholder trick: the appended
``[UNK]`` becomes the "final item" the next-item task drops, leaving the
prediction slot at the last real history position — SASRec's "predict from
the representation of the last seen item".
"""

from bert4rec_tpu.dataloaders.preprocessors.bert4rec_preprocessor import (
    BERT4RecPreprocessor,
)


class SASRecPreprocessor(BERT4RecPreprocessor):

    _TASK = "next_item"
