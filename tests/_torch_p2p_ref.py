"""Torch transcription of the reference prompt-to-prompt controller stack,
used ONLY as a differential-test oracle (like tests/_torch_train_ref.py for
the losses). NOT shipped code.

Provenance / license: portions transcribed from yandex-research/invertible-cd
(`utils/p2p.py`), which is distributed under the Apache License 2.0 (see the
reference's LICENSE); this test-only oracle retains that license for the
transcribed portions.

Transcribed semantics (cited against /root/reference/utils/p2p.py):
  LocalBlend                 p2p.py:18-70
  AttentionControl.__call__  p2p.py:85-122  (CFG convention: attn[h//2:])
  AttentionStore             p2p.py:138-173 (step_store / between_steps sums)
  AttentionControlEdit       p2p.py:176-221 (cross alpha mix, self replace)
  AttentionReplace           p2p.py:224-232
  AttentionRefine            p2p.py:235-248
  AttentionReweight          p2p.py:251-265 (chains prev controller)
  get_time_words_attention_alpha p2p.py:403-421
  make_controller            p2p.py:272-289

Deviations, deliberate and test-local:
  * module globals (tokenizer/device/NUM_DDIM_STEPS) become constructor
    params; everything runs on CPU float64-free torch.
  * `get_word_inds` and the seq_aligner mappers come from the repo's own
    aligner (invertible_cd_tpu/edit/aligner.py) so the oracle isolates the
    CONTROLLER math — the aligner itself is differential-tested separately
    (tests/test_tokenizer_aligner.py ties the tie-breaking to the
    reference algorithm).
"""
import abc

import numpy as np
import torch
import torch.nn.functional as nnf

from invertible_cd_tpu.edit.aligner import (
    get_refinement_mapper,
    get_replacement_mapper,
    get_word_inds,
)

MAX_NUM_WORDS = 77


def get_time_words_attention_alpha(prompts, num_steps, cross_replace_steps,
                                   tokenizer, max_num_words=MAX_NUM_WORDS):
    # reference p2p.py:403-421
    if type(cross_replace_steps) is not dict:
        cross_replace_steps = {"default_": cross_replace_steps}
    if "default_" not in cross_replace_steps:
        cross_replace_steps["default_"] = (0., 1.)

    def update_alpha_time_word(alpha, bounds, prompt_ind, word_inds=None):
        if type(bounds) is float or type(bounds) is int:
            bounds = 0, bounds
        start, end = int(bounds[0] * alpha.shape[0]), int(bounds[1] * alpha.shape[0])
        if word_inds is None:
            word_inds = torch.arange(alpha.shape[2])
        alpha[:start, prompt_ind, word_inds] = 0
        alpha[start:end, prompt_ind, word_inds] = 1
        alpha[end:, prompt_ind, word_inds] = 0
        return alpha

    alpha_time_words = torch.zeros(num_steps + 1, len(prompts) - 1, max_num_words)
    for i in range(len(prompts) - 1):
        alpha_time_words = update_alpha_time_word(
            alpha_time_words, cross_replace_steps["default_"], i
        )
    for key, item in cross_replace_steps.items():
        if key != "default_":
            inds = [
                torch.as_tensor(get_word_inds(prompts[i], key, tokenizer))
                for i in range(1, len(prompts))
            ]
            for i, ind in enumerate(inds):
                if len(ind) > 0:
                    alpha_time_words = update_alpha_time_word(
                        alpha_time_words, item, i, ind
                    )
    return alpha_time_words.reshape(
        num_steps + 1, len(prompts) - 1, 1, 1, max_num_words
    )


def get_equalizer(text, word_select, values, tokenizer):
    # reference p2p.py:391-401
    if type(word_select) is int or type(word_select) is str:
        word_select = (word_select,)
    equalizer = torch.ones(1, MAX_NUM_WORDS)
    for word, val in zip(word_select, values):
        inds = get_word_inds(text, word, tokenizer)
        equalizer[:, inds] = val
    return equalizer


class LocalBlend:
    # reference p2p.py:18-70

    def get_mask(self, maps, alpha, use_pool, x_t):
        k = 1
        maps = (maps * alpha).sum(-1).mean(1)
        if use_pool:
            maps = nnf.max_pool2d(maps, (k * 2 + 1, k * 2 + 1), (1, 1), padding=(k, k))
        mask = nnf.interpolate(maps, size=(x_t.shape[2:]))
        mask = mask / mask.max(2, keepdims=True)[0].max(3, keepdims=True)[0]
        mask = mask.gt(self.th[1 - int(use_pool)])
        mask = mask[:1] + mask
        return mask

    def __call__(self, x_t, attention_store):
        self.counter += 1
        if self.counter > self.start_blend:
            maps = attention_store["down_cross"][2:4] + attention_store["up_cross"][:3]
            maps = [
                item.reshape(self.alpha_layers.shape[0], -1, 1, 16, 16, MAX_NUM_WORDS)
                for item in maps
            ]
            maps = torch.cat(maps, dim=1)
            mask = self.get_mask(maps, self.alpha_layers, True, x_t)
            if self.substruct_layers is not None:
                maps_sub = ~self.get_mask(maps, self.substruct_layers, False, x_t)
                mask = mask * maps_sub
            mask = mask.float()
            x_t = x_t[:1] + mask * (x_t - x_t[:1])
        return x_t

    def __init__(self, prompts, words, tokenizer, num_steps,
                 substruct_words=None, start_blend=0.2, th=(.3, .3)):
        alpha_layers = torch.zeros(len(prompts), 1, 1, 1, 1, MAX_NUM_WORDS)
        for i, (prompt, words_) in enumerate(zip(prompts, words)):
            if type(words_) is str:
                words_ = [words_]
            for word in words_:
                ind = get_word_inds(prompt, word, tokenizer)
                alpha_layers[i, :, :, :, :, ind] = 1
        if substruct_words is not None:
            substruct_layers = torch.zeros(len(prompts), 1, 1, 1, 1, MAX_NUM_WORDS)
            for i, (prompt, words_) in enumerate(zip(prompts, substruct_words)):
                if type(words_) is str:
                    words_ = [words_]
                for word in words_:
                    ind = get_word_inds(prompt, word, tokenizer)
                    substruct_layers[i, :, :, :, :, ind] = 1
            self.substruct_layers = substruct_layers
        else:
            self.substruct_layers = None
        self.alpha_layers = alpha_layers
        self.start_blend = int(start_blend * num_steps)
        self.counter = 0
        self.th = th


class AttentionControl(abc.ABC):
    # reference p2p.py:85-122 (LOW_RESOURCE=False path)

    def step_callback(self, x_t):
        return x_t

    def between_steps(self):
        return

    @abc.abstractmethod
    def forward(self, attn, is_cross, place_in_unet):
        raise NotImplementedError

    def __call__(self, attn, is_cross, place_in_unet):
        h = attn.shape[0]
        attn[h // 2:] = self.forward(attn[h // 2:], is_cross, place_in_unet)
        self.cur_att_layer += 1
        if self.cur_att_layer == self.num_att_layers:
            self.cur_att_layer = 0
            self.cur_step += 1
            self.between_steps()
        return attn

    def __init__(self):
        self.cur_step = 0
        self.num_att_layers = -1
        self.cur_att_layer = 0


class AttentionStore(AttentionControl):
    # reference p2p.py:138-173

    @staticmethod
    def get_empty_store():
        return {"down_cross": [], "mid_cross": [], "up_cross": [],
                "down_self": [], "mid_self": [], "up_self": []}

    def forward(self, attn, is_cross, place_in_unet):
        key = f"{place_in_unet}_{'cross' if is_cross else 'self'}"
        if attn.shape[1] <= 32 ** 2:
            self.step_store[key].append(attn)
        return attn

    def between_steps(self):
        if len(self.attention_store) == 0:
            self.attention_store = self.step_store
        else:
            for key in self.attention_store:
                for i in range(len(self.attention_store[key])):
                    self.attention_store[key][i] += self.step_store[key][i]
        self.step_store = self.get_empty_store()

    def __init__(self):
        super().__init__()
        self.step_store = self.get_empty_store()
        self.attention_store = {}


class AttentionControlEdit(AttentionStore, abc.ABC):
    # reference p2p.py:176-221

    def step_callback(self, x_t):
        if self.local_blend is not None:
            x_t = self.local_blend(x_t, self.attention_store)
        return x_t

    def replace_self_attention(self, attn_base, att_replace, place_in_unet):
        if att_replace.shape[2] <= 32 ** 2:
            attn_base = attn_base.unsqueeze(0).expand(
                att_replace.shape[0], *attn_base.shape
            )
            return attn_base
        else:
            return att_replace

    @abc.abstractmethod
    def replace_cross_attention(self, attn_base, att_replace):
        raise NotImplementedError

    def forward(self, attn, is_cross, place_in_unet):
        super().forward(attn, is_cross, place_in_unet)
        if is_cross or (
            self.num_self_replace[0] <= self.cur_step < self.num_self_replace[1]
        ):
            h = attn.shape[0] // (self.batch_size)
            attn = attn.reshape(self.batch_size, h, *attn.shape[1:])
            attn_base, attn_repalce = attn[0], attn[1:]
            if is_cross:
                alpha_words = self.cross_replace_alpha[self.cur_step]
                attn_repalce_new = (
                    self.replace_cross_attention(attn_base, attn_repalce)
                    * alpha_words + (1 - alpha_words) * attn_repalce
                )
                attn[1:] = attn_repalce_new
            else:
                attn[1:] = self.replace_self_attention(
                    attn_base, attn_repalce, place_in_unet
                )
            attn = attn.reshape(self.batch_size * h, *attn.shape[2:])
        return attn

    def __init__(self, prompts, num_steps, cross_replace_steps,
                 self_replace_steps, local_blend, tokenizer):
        super().__init__()
        self.batch_size = len(prompts)
        self.cross_replace_alpha = get_time_words_attention_alpha(
            prompts, num_steps, cross_replace_steps, tokenizer
        )
        if type(self_replace_steps) is float:
            self_replace_steps = 0, self_replace_steps
        self.num_self_replace = (
            int(num_steps * self_replace_steps[0]),
            int(num_steps * self_replace_steps[1]),
        )
        self.local_blend = local_blend


class AttentionReplace(AttentionControlEdit):
    # reference p2p.py:224-232

    def replace_cross_attention(self, attn_base, att_replace):
        return torch.einsum("hpw,bwn->bhpn", attn_base, self.mapper)

    def __init__(self, prompts, num_steps, cross_replace_steps,
                 self_replace_steps, tokenizer, local_blend=None):
        super().__init__(prompts, num_steps, cross_replace_steps,
                         self_replace_steps, local_blend, tokenizer)
        self.mapper = torch.as_tensor(
            np.asarray(get_replacement_mapper(prompts, tokenizer), np.float32)
        )


class AttentionRefine(AttentionControlEdit):
    # reference p2p.py:235-248

    def replace_cross_attention(self, attn_base, att_replace):
        attn_base_replace = attn_base[:, :, self.mapper].permute(2, 0, 1, 3)
        attn_replace = attn_base_replace * self.alphas + att_replace * (1 - self.alphas)
        return attn_replace

    def __init__(self, prompts, num_steps, cross_replace_steps,
                 self_replace_steps, tokenizer, local_blend=None):
        super().__init__(prompts, num_steps, cross_replace_steps,
                         self_replace_steps, local_blend, tokenizer)
        mapper, alphas = get_refinement_mapper(prompts, tokenizer)
        self.mapper = torch.as_tensor(np.asarray(mapper, np.int64))
        alphas = torch.as_tensor(np.asarray(alphas, np.float32))
        self.alphas = alphas.reshape(alphas.shape[0], 1, 1, alphas.shape[1])


class AttentionReweight(AttentionControlEdit):
    # reference p2p.py:251-265

    def replace_cross_attention(self, attn_base, att_replace):
        if self.prev_controller is not None:
            attn_base = self.prev_controller.replace_cross_attention(
                attn_base, att_replace
            )
        # literal reference line incl. the [None]: with a chained prev the
        # result is rank-5 with a leading 1 — torch broadcasts it away in
        # the caller's alpha mix + setitem (verified empirically).
        attn_replace = attn_base[None, :, :, :] * self.equalizer[:, None, None, :]
        return attn_replace

    def __init__(self, prompts, num_steps, cross_replace_steps,
                 self_replace_steps, equalizer, tokenizer,
                 local_blend=None, controller=None):
        super().__init__(prompts, num_steps, cross_replace_steps,
                         self_replace_steps, local_blend, tokenizer)
        self.equalizer = equalizer
        self.prev_controller = controller


def make_controller(prompts, is_replace_controller, cross_replace_steps,
                    self_replace_steps, tokenizer, num_steps,
                    blend_words=None, equilizer_params=None,
                    substruct_words=None):
    # reference p2p.py:272-289 (start_blend=0.0, th=(0.3, 0.3) as edit.py
    # uses). substruct_words is LocalBlend's own knob (p2p.py:46) which the
    # reference make_controller doesn't surface — exposed here so the
    # oracle can cover the substruct path.
    if blend_words is None:
        lb = None
    else:
        lb = LocalBlend(prompts, blend_words, tokenizer, num_steps,
                        substruct_words=substruct_words,
                        start_blend=0.0, th=(0.3, 0.3))
    if is_replace_controller:
        controller = AttentionReplace(
            prompts, num_steps, cross_replace_steps, self_replace_steps,
            tokenizer, local_blend=lb,
        )
    else:
        controller = AttentionRefine(
            prompts, num_steps, cross_replace_steps, self_replace_steps,
            tokenizer, local_blend=lb,
        )
    if equilizer_params is not None:
        eq = get_equalizer(
            prompts[1], equilizer_params["words"], equilizer_params["values"],
            tokenizer,
        )
        controller = AttentionReweight(
            prompts, num_steps, cross_replace_steps, self_replace_steps, eq,
            tokenizer, local_blend=lb, controller=controller,
        )
    return controller
