from neural_speech_decoding_tpu.parallel.mesh import make_mesh, mesh_axes  # noqa: F401
from neural_speech_decoding_tpu.parallel.sharding import (  # noqa: F401
    batch_sharding,
    replicate,
    shard_params_tp,
    sharded_predict_fn,
)
