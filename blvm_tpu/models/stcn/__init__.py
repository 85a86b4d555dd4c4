from blvm_tpu.models.stcn.stcn import STCN, DiagonalGaussianDenseSTCN
