"""Gradio web demo (reference app.py:92-183): text box with language tags,
speaker dropdown, seed, scope-shift slider (pitch), duration multiplier.

Gradio is optional; the CLI (`python -m vits_tpu.serve.engine`) covers
headless serving.
"""

from __future__ import annotations

import argparse

from vits_tpu.serve.engine import TTSEngine


def build_interface(engine: TTSEngine):
    try:
        import gradio as gr
    except ImportError as e:  # pragma: no cover - env dependent
        raise ImportError(
            "gradio is not installed; use `python -m vits_tpu.serve.engine` "
            "for CLI synthesis"
        ) from e

    def infer(text, speaker_id, seed, scope_shift, duration):
        phones, (sr, audio) = engine.synthesize(
            text, int(speaker_id), int(seed), int(scope_shift), float(duration)
        )
        return phones, (sr, audio)

    speakers = list(engine.hps.data.speakers)
    return gr.Interface(
        fn=infer,
        inputs=[
            gr.Textbox(
                label="text",
                value="[EN]hello world[EN]",
                info="tag languages: [EN]..[EN] [ZH]..[ZH] [JA]..[JA] [P]..[P]",
            ),
            gr.Dropdown(
                choices=list(range(len(speakers))),
                value=0,
                label=f"speaker ({', '.join(speakers)})",
            ),
            gr.Number(value=0, label="seed"),
            gr.Slider(minimum=-15, maximum=15, step=1, value=0,
                      label="pitch scope shift"),
            gr.Slider(minimum=0.5, maximum=2.0, step=0.1, value=1.0,
                      label="duration multiplier"),
        ],
        outputs=[gr.Textbox(label="phonemes"), gr.Audio(label="audio")],
        title="vits_tpu demo",
    )


def main():  # pragma: no cover - interactive
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--config", required=True)
    parser.add_argument("-p", "--checkpoint", default=None)
    parser.add_argument("--port", type=int, default=7860)
    args = parser.parse_args()
    engine = TTSEngine(args.config, args.checkpoint)
    build_interface(engine).launch(server_port=args.port)


if __name__ == "__main__":
    main()
