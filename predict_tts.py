"""Stage-5 inference CLI: text → mel → Griffin-Lim → wav.

Flag surface matches the reference predict_tts.py; synthesis and waveform
reconstruction run on device.
"""
from argparse import ArgumentParser
from pathlib import Path

import numpy as np

from transformertts_tpu.models.factory import tts_ljspeech
from transformertts_tpu.utils.scripts_utils import enable_compilation_cache
from transformertts_tpu.audio import Audio
from transformertts_tpu.models import ForwardTransformer

def main(argv=None):
    parser = ArgumentParser()
    parser.add_argument('--path', '-p', dest='path', default=None, type=str)
    parser.add_argument('--step', dest='step', default='95000', type=str)
    parser.add_argument('--text', '-t', dest='text', default=None, type=str)
    parser.add_argument('--file', '-f', dest='file', default=None, type=str)
    parser.add_argument('--outdir', '-o', dest='outdir', default=None, type=str)
    parser.add_argument('--store_mel', '-m', dest='store_mel', action='store_true')
    parser.add_argument('--verbose', '-v', dest='verbose', action='store_true')
    parser.add_argument('--single', '-s', dest='single', action='store_true')
    parser.add_argument('--per_line', dest='per_line', action='store_true',
                        help='disable batched synthesis (one device call per line)')
    parser.add_argument('--vocoder', dest='vocoder', default=None, type=str,
                        help='path to a MelGAN (seungwonpark/melgan) or HiFi-GAN '
                             '(jik876/hifi-gan) torch checkpoint; synthesizes with '
                             'the neural vocoder on device instead of Griffin-Lim')
    parser.add_argument('--data_parallel', dest='data_parallel', default=1,
                        type=int,
                        help='shard batched synthesis over N devices '
                             '(data-parallel mesh; batched path only)')
    args = parser.parse_args(argv)
    enable_compilation_cache()

    if args.file is not None:
        with open(args.file, 'r') as file:
            text = file.readlines()
        fname = Path(args.file).stem
    elif args.text is not None:
        text = [args.text]
        fname = 'custom_text'
    else:
        print('Specify either an input text (-t "some text") or a text input file (-f /path/to/file.txt)')
        raise SystemExit(1)

    outdir = Path(args.outdir) if args.outdir is not None else Path('.')
    if args.path is not None:
        print(f'Loading model from {args.path}')
        model = ForwardTransformer.load_model(args.path)
    else:
        model = tts_ljspeech(args.step)
    file_name = (f"{fname}_{model.config.get('data_name', 'custom')}_"
                 f"{model.config.get('git_hash', 'local')}_{model.config.get('step', 0)}")
    outdir = outdir / 'outputs' / f'{fname}'
    outdir.mkdir(exist_ok=True, parents=True)
    output_path = (outdir / file_name).with_suffix('.wav')
    audio = Audio.from_config(model.config)
    vocoder = None
    if args.vocoder is not None:
        from transformertts_tpu.models.vocoder import load_vocoder
        print(f'Loading vocoder from {args.vocoder}')
        vocoder = load_vocoder(args.vocoder,
                               mel_channels=model.config['mel_channels'])
        print(f'Vocoder: {type(vocoder).__name__}')
    print(f'Output wav under {output_path.parent}')
    lines = [l for l in text if l.strip()]
    if not args.per_line and not args.store_mel and len(lines) > 1:
        # batched serving path: bucketed device batches + vmapped Griffin-Lim
        from transformertts_tpu.models.synthesis import synthesize_lines
        mesh = None
        if args.data_parallel > 1:
            import jax
            from transformertts_tpu.parallel import MeshConfig, make_mesh
            mesh = make_mesh(MeshConfig(data=args.data_parallel, model=1),
                             devices=jax.devices()[:args.data_parallel])
            print(f'Serving over a {args.data_parallel}-device data-parallel mesh')
        wavs = synthesize_lines(model, audio, lines, vocoder=vocoder,
                                mesh=mesh)
        for i, wav in enumerate(wavs):
            if args.single:
                audio.save_wav(wav, (outdir / (file_name + f'_{i}')).with_suffix('.wav'))
    else:
        wavs = []
        for i, text_line in enumerate(lines):
            phons = model.text_pipeline.phonemizer(text_line)
            tokens = model.text_pipeline.tokenizer(phons)
            if args.verbose:
                print(f'Predicting {text_line}')
                print(f'Phonemes: "{phons}"')
                print(f'Tokens: "{tokens}"')
            out = model.predict(tokens, encode=False)
            mel = out['mel'].T
            if vocoder is not None:
                wav = vocoder.inference(np.asarray(mel))
            else:
                wav = audio.reconstruct_waveform(mel)
            wavs.append(wav)
            if args.store_mel:
                np.save(str((outdir / (file_name + f'_{i}')).with_suffix('.mel')), out['mel'])
            if args.single:
                audio.save_wav(wav, (outdir / (file_name + f'_{i}')).with_suffix('.wav'))
    audio.save_wav(np.concatenate(wavs), output_path)


if __name__ == '__main__':
    main()
