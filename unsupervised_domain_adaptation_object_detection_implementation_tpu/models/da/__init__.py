from .heads import (GlobalAlignmentHead, SRMHead, PixelAlignmentHead,
                    ImageAlignmentHead, InstanceAlignmentHead,
                    SharedDAConvHead)
from .losses import (global_alignment_loss, patch_ls_loss, image_da_loss,
                     consistency_loss, grouped_instance_loss)
from .cluster import masked_kmeans, group_representatives
from .cyclegan import ResnetGenerator, PatchDiscriminator

__all__ = ['GlobalAlignmentHead', 'SRMHead', 'PixelAlignmentHead',
           'ImageAlignmentHead', 'InstanceAlignmentHead', 'SharedDAConvHead',
           'global_alignment_loss', 'patch_ls_loss', 'image_da_loss',
           'consistency_loss', 'grouped_instance_loss', 'masked_kmeans',
           'group_representatives', 'ResnetGenerator', 'PatchDiscriminator']
