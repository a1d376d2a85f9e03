"""Patch discriminator for VAE-GAN training (ref afldm/models/discriminator.py:38-93).

The reference's antialias=True path is broken (stale kwargs / unset
attributes, SURVEY.md §2.12 item 3); here the alias-free variant is
implemented as intended: stride-1 convs followed by ideal LPF + decimate,
and the filtered leaky-ReLU sandwich."""

import jax.numpy as jnp
import flax.linen as nn

from ..ops.ideal_lpf import downsample_rfft, filtered_nonlinearity


class Discriminator(nn.Module):
    in_channels: int = 3
    hidden_channels: int = 512
    depth: int = 6
    use_bn: bool = False  # reference default: InstanceNorm
    antialias: bool = False
    mod_act: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.use_bn:
            # the reference's use_bn arm is BatchNorm2d + bias-FREE convs
            # (discriminator.py:44-45); this port implements only the
            # default InstanceNorm + biased-conv arm — running a different
            # architecture silently would invalidate any BN ablation
            raise NotImplementedError(
                "use_bn=True (BatchNorm + bias-free convs) is not "
                "implemented; only the reference default "
                "(InstanceNorm + biased convs) is")

        def norm(h, name):
            # InstanceNorm == GroupNorm with one group per channel.
            return nn.GroupNorm(num_groups=h.shape[-1], epsilon=1e-5,
                                use_bias=False, use_scale=False,
                                dtype=self.dtype, name=name)(h)

        def act(h):
            if self.antialias and self.mod_act:
                return filtered_nonlinearity(h, "leaky_relu")
            return nn.leaky_relu(h, 0.2)

        def down_conv(h, ch, name):
            if self.antialias:
                h = nn.Conv(ch, (4, 4), strides=(1, 1), padding="SAME",
                            dtype=self.dtype, name=name)(h)
                return downsample_rfft(h, down=2)
            return nn.Conv(ch, (4, 4), strides=(2, 2),
                           padding=((1, 1), (1, 1)), dtype=self.dtype,
                           name=name)(h)

        d = max(self.depth - 3, 3)
        x = down_conv(x, self.hidden_channels // (2 ** d), "conv_0")
        x = act(x)
        c_out = self.hidden_channels // (2 ** d)
        for i in range(self.depth - 1):
            c_out = self.hidden_channels // (2 ** max(d - 1 - i, 0))
            x = down_conv(x, c_out, f"conv_{i + 1}")
            x = norm(x, f"norm_{i + 1}")
            x = act(x)
        x = nn.Conv(self.hidden_channels, (4, 4), strides=(1, 1),
                    padding=((1, 1), (1, 1)), dtype=self.dtype,
                    name="conv_pre")(x)
        x = norm(x, "norm_pre")
        x = act(x)
        x = nn.Conv(1, (4, 4), strides=(1, 1), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="conv_out")(x)
        return x


def hinge_d_loss(logits_real, logits_fake):
    """Hinge GAN discriminator loss (reference VAE trainer style)."""
    loss_real = jnp.mean(nn.relu(1.0 - logits_real))
    loss_fake = jnp.mean(nn.relu(1.0 + logits_fake))
    return 0.5 * (loss_real + loss_fake)


def hinge_g_loss(logits_fake):
    return -jnp.mean(logits_fake)
