from .rpn_head import (RPNHead, RPNTrainConfig, ProposalConfig, rpn_loss,
                       rpn_proposals)

__all__ = ['RPNHead', 'RPNTrainConfig', 'ProposalConfig', 'rpn_loss',
           'rpn_proposals']
