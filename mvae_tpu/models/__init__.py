from mvae_tpu.models.base import MultimodalVAE
