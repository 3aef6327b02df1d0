from .nmf_kernel import nmf_reconstruct, xla_nmf_reconstruct, supports
