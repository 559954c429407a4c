"""Kaldi-style scp parsing/writing.

File-format compatible with the reference (crank/utils/utils.py:33-64,
crank/bin/generate_scp.py): ``wav.scp`` maps uid -> wav path, ``utt2spk`` maps
uid -> speaker, ``spk2utt`` maps speaker -> uid list, ``feats.scp`` maps
uid -> feature-file path.
"""

from pathlib import Path


def open_featsscp(featsscp):
    feats = {}
    with open(featsscp) as fp:
        for line in fp:
            line = line.rstrip()
            if not line:
                continue
            uid, h5f = line.split()
            feats[uid] = h5f
    return feats


def open_scpdir(scpdir):
    scp = {"wav": {}, "feats": {}, "utt2spk": {}, "spk2utt": {}}
    scpdir = Path(scpdir)
    with open(scpdir / "wav.scp") as fp:
        for line in fp:
            line = line.rstrip()
            if not line:
                continue
            uid, wavf = line.split()
            scp["wav"][uid] = wavf

    with open(scpdir / "utt2spk") as fp:
        for line in fp:
            line = line.rstrip()
            if not line:
                continue
            uid, spkr = line.split()
            scp["utt2spk"][uid] = spkr

    spkrs = []
    with open(scpdir / "spk2utt") as fp:
        for line in fp:
            parts = line.rstrip().split()
            if not parts:
                continue
            spkrs.append(parts[0])
            scp["spk2utt"][parts[0]] = parts[1:]
    scp["spkrs"] = spkrs
    return scp


def write_scp(tdir, spkr, wavfs, append=True):
    """Write wav.scp/utt2spk/spk2utt for one speaker (generate_scp.py:29-53)."""
    tdir = Path(tdir)
    tdir.mkdir(parents=True, exist_ok=True)
    mode = "a" if append else "w"
    wavscp, utt2spk, spk2utt = [], [], [spkr]
    for f in wavfs:
        f = Path(f)
        uid = f"{spkr}_{f.stem}"
        wavscp.append(f"{uid} {f}")
        utt2spk.append(f"{uid} {spkr}")
        spk2utt.append(uid)
    with open(tdir / "wav.scp", mode) as fp:
        fp.write("\n".join(wavscp) + "\n")
    with open(tdir / "utt2spk", mode) as fp:
        fp.write("\n".join(utt2spk) + "\n")
    with open(tdir / "spk2utt", mode) as fp:
        fp.write(" ".join(spk2utt) + "\n")
