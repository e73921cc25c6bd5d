"""LiveLink-format CSV export and offline CSV utilities.

Matches the reference's CSV ecosystem (reference: utils/csv/save_csv.py,
plot_comparison.py, split_csv.py): 61 named ARKit blendshape columns plus
Timecode (HH:mm:ss:ff.mmm at 60 fps) and BlendshapeCount, with 7 optional
emotion columns (off in Lite).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

BASE_COLUMNS = [
    "Timecode", "BlendshapeCount",
    "EyeBlinkLeft", "EyeLookDownLeft", "EyeLookInLeft", "EyeLookOutLeft",
    "EyeLookUpLeft", "EyeSquintLeft", "EyeWideLeft", "EyeBlinkRight",
    "EyeLookDownRight", "EyeLookInRight", "EyeLookOutRight", "EyeLookUpRight",
    "EyeSquintRight", "EyeWideRight", "JawForward", "JawRight", "JawLeft",
    "JawOpen", "MouthClose", "MouthFunnel", "MouthPucker", "MouthRight",
    "MouthLeft", "MouthSmileLeft", "MouthSmileRight", "MouthFrownLeft",
    "MouthFrownRight", "MouthDimpleLeft", "MouthDimpleRight",
    "MouthStretchLeft", "MouthStretchRight", "MouthRollLower",
    "MouthRollUpper", "MouthShrugLower", "MouthShrugUpper", "MouthPressLeft",
    "MouthPressRight", "MouthLowerDownLeft", "MouthLowerDownRight",
    "MouthUpperUpLeft", "MouthUpperUpRight", "BrowDownLeft", "BrowDownRight",
    "BrowInnerUp", "BrowOuterUpLeft", "BrowOuterUpRight", "CheekPuff",
    "CheekSquintLeft", "CheekSquintRight", "NoseSneerLeft", "NoseSneerRight",
    "TongueOut", "HeadYaw", "HeadPitch", "HeadRoll", "LeftEyeYaw",
    "LeftEyePitch", "LeftEyeRoll", "RightEyeYaw", "RightEyePitch",
    "RightEyeRoll",
]

EMOTION_COLUMNS = ["Angry", "Disgusted", "Fearful", "Happy", "Neutral",
                   "Sad", "Surprised"]

DIMENSION_LABELS = BASE_COLUMNS[2:]  # the 61 blendshape names in order


def make_timecode(i: int, frame_rate: int = 60) -> str:
    """Frame index → 'HH:mm:ss:ff.mmm' (reference: save_csv.py:42-51,
    including its frame-within-second convention)."""
    total_seconds = i / frame_rate
    hours, remainder = divmod(total_seconds, 3600)
    minutes, seconds = divmod(remainder, 60)
    milliseconds = (seconds - int(seconds)) * 1000
    frame_number = int(milliseconds / (1000 / frame_rate))
    return (f"{int(hours):02}:{int(minutes):02}:{int(seconds):02}:"
            f"{frame_number:02}.{int(milliseconds):03}")


def save_generated_data_as_csv(generated, output_path: str,
                               include_emotion_dimensions: bool = False) -> None:
    """[T, 61|68] blendshape array → LiveLink CSV (reference: save_csv.py:4-63)."""
    generated = np.array(generated)
    if generated.shape[1] not in (68, 61):
        raise ValueError(
            f"Expected generated data to have 68 or 61 columns, got "
            f"{generated.shape[1]}")

    if include_emotion_dimensions:
        columns = BASE_COLUMNS + EMOTION_COLUMNS
        data = generated
    else:
        columns = BASE_COLUMNS
        data = generated[:, :61]

    frame_count = data.shape[0]
    timecodes = np.array([make_timecode(i) for i in range(frame_count)])
    out = pd.DataFrame(data, columns=columns[2:])
    out.insert(0, "BlendshapeCount", data.shape[1])
    out.insert(0, "Timecode", timecodes)
    out.to_csv(output_path, index=False)
    print(f"Generated data saved to {output_path}")


def pad_data(df1: pd.DataFrame, df2: pd.DataFrame):
    """Zero-pad the shorter frame to equal lengths (reference:
    plot_comparison.py:5-15)."""
    max_len = max(len(df1), len(df2))

    def pad(df):
        if len(df) < max_len:
            padding = pd.DataFrame(0, index=np.arange(max_len - len(df)),
                                   columns=df.columns)
            return pd.concat([df, padding], ignore_index=True)
        return df

    return pad(df1), pad(df2)


def plot_comparison(ground_truth_path: str, generated_path: str,
                    output_image_path: str,
                    features_to_plot=("JawOpen",)) -> None:
    """Overlay plot of ground truth vs generated, first 512 frames
    (reference: plot_comparison.py:17-45)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    ground_truth = pd.read_csv(ground_truth_path)
    generated = pd.read_csv(generated_path)
    ground_truth, generated = pad_data(ground_truth, generated)
    ground_truth, generated = ground_truth.head(512), generated.head(512)

    timecodes = ground_truth["Timecode"].astype(str)
    plt.figure(figsize=(20, 20))
    for feature in features_to_plot:
        plt.plot(timecodes, ground_truth[feature],
                 label=f"Ground Truth {feature}")
        plt.plot(timecodes, generated[feature],
                 label=f"Generated {feature}", linestyle="dashed")
    plt.legend()
    plt.xticks(rotation=45)
    plt.xlabel("Timecode")
    plt.ylabel("Feature Value")
    plt.title("Comparison of Ground Truth and Generated Facial Features")
    plt.tight_layout()
    plt.savefig(output_image_path, dpi=100)
    plt.close()
    print(f"Comparison plot saved to {output_image_path}")


def split_csv_by_frames(input_csv_path: str, output_dir: str,
                        num_chunks: int = 4) -> list[str]:
    """Offline utility: split a capture CSV into chunks
    (reference: split_csv.py:7-38, semantics preserved exactly — including
    its quirks: when the row count isn't divisible, the whole frame is first
    mirror-padded to a multiple of num_chunks, but chunk_size stays
    floor(pre-pad/num_chunks), so the LAST chunk absorbs every padded and
    remainder row and comes out larger than the others)."""
    import os

    df = pd.read_csv(input_csv_path)
    total = len(df)
    chunk_size = total // num_chunks
    remainder = total % num_chunks
    if remainder != 0:
        padding = df.iloc[-(num_chunks - remainder):].iloc[::-1]
        df = pd.concat([df, padding], ignore_index=True)
    total = len(df)

    os.makedirs(output_dir, exist_ok=True)
    paths = []
    for i in range(num_chunks):
        start = i * chunk_size
        end = (i + 1) * chunk_size if i < num_chunks - 1 else total
        chunk = df[start:end]
        path = os.path.join(output_dir,
                            f"{os.path.basename(input_csv_path)[:-4]}_part{i + 1}.csv")
        chunk.to_csv(path, index=False)
        paths.append(path)
    return paths
