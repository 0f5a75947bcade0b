"""Prompt-render parity against the mounted reference's conversation module."""

import sys

import pytest


@pytest.fixture(scope="module")
def ref_conv():
    sys.path.insert(0, "/root/reference")
    try:
        from src.data.components import conversation as ref
    finally:
        sys.path.remove("/root/reference")
    return ref


DIALOGUE = [("what is in the video?", "a dog running"),
            ("what color is it?", None)]


@pytest.mark.parametrize("name", ["v0", "v1", "vicuna_v1", "llava_v0",
                                  "llava_v1", "flant5", "mpt"])
def test_get_prompt_matches_reference(ref_conv, name):
    from videotgb_tpu.data.conversation import conv_templates

    ours = conv_templates[name].copy()
    theirs = ref_conv.conv_templates[name].copy()
    # the reference's v0 bakes a canned few-shot dialogue into the template;
    # we compare rendering structure with seeds cleared
    theirs.messages = []
    ours.messages = []
    for q, a in DIALOGUE:
        ours.append_message(ours.roles[0], q)
        theirs.append_message(theirs.roles[0], q)
        ours.append_message(ours.roles[1], a)
        theirs.append_message(theirs.roles[1], a)
    assert ours.get_prompt() == theirs.get_prompt(), name


def test_llama2_prompt_matches_reference(ref_conv):
    from videotgb_tpu.data.conversation import conv_templates

    ours = conv_templates["llama_2"].copy()
    theirs = ref_conv.conv_templates["llama_2"].copy()
    # systems differ by design (ours is abbreviated); align for the structure
    ours.system = theirs.system
    for q, a in DIALOGUE:
        ours.append_message(ours.roles[0], q)
        theirs.append_message(theirs.roles[0], q)
        if a:
            ours.append_message(ours.roles[1], a)
            theirs.append_message(theirs.roles[1], a)
    assert ours.get_prompt() == theirs.get_prompt()


def test_image_tuple_message_matches_reference(ref_conv):
    from videotgb_tpu.data.conversation import conv_templates

    ours = conv_templates["vicuna_v1"].copy()
    theirs = ref_conv.conv_templates["vicuna_v1"].copy()
    msg = ("describe <image> please", "IMAGE", "Crop")
    ours.append_message(ours.roles[0], msg)
    theirs.append_message(theirs.roles[0], msg)
    ours.append_message(ours.roles[1], None)
    theirs.append_message(theirs.roles[1], None)
    assert ours.get_prompt() == theirs.get_prompt()
