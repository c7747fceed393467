"""AtmoNR-TPU: a TPU-native differentiable volumetric rendering framework for
atmospheric cloud tomography from multi-angle satellite imagery.

Re-designed from scratch for TPUs (JAX/XLA/Pallas/pjit) with the capabilities of
the reference nasa/atmospheric-neural-rendering (PyTorch/CUDA/tiny-cuda-nn):

- ``atmonr_tpu.geo``       WGS-84 / spherical geospatial math (numpy- and JAX-generic)
- ``atmonr_tpu.data``      HARP2 granule loading, ray construction, HBM-resident batching
- ``atmonr_tpu.models``    frequency / spherical-harmonic / multiresolution-hash encoders,
                           NeRF MLPs as explicit parameter pytrees
- ``atmonr_tpu.ops``       samplers, Beer-Lambert compositors, losses, Pallas kernels
- ``atmonr_tpu.pipelines`` vanilla/hierarchical NeRF and Instant-NGP rendering pipelines
- ``atmonr_tpu.training``  jitted train step, optimizers/schedules, metrics, checkpointing
- ``atmonr_tpu.parallel``  device meshes, ray (data) sharding, sample-axis compositing
- ``atmonr_tpu.extract``   volume extraction on L1C / voxel / global / EarthCARE grids
"""

__version__ = "0.1.0"
