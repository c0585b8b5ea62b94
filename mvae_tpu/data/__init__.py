from mvae_tpu.data.pipeline import ArrayDataset, batches, shard_batch
