"""Tests for the labeled-array layer and its netCDF round-trip."""

import numpy as np
import pytest

from amof_tpu.labeled import DataArray, Dataset, concat, open_dataset


class TestDataArray:
    def test_construction_xarray_style(self):
        da = DataArray(
            np.zeros((2, 3)),
            coords=[("Step", [0, 10]), ("ring_size", [3, 4, 5])],
            name="ring",
        )
        assert da.dims == ("Step", "ring_size")
        assert np.array_equal(da.get_coord("ring_size"), [3, 4, 5])

    def test_sel_isel(self):
        da = DataArray(
            np.arange(6).reshape(2, 3),
            coords={"a": np.array([10, 20]), "b": np.array(["x", "y", "z"])},
            dims=("a", "b"),
        )
        assert da.sel(a=20, b="y").values == 4
        sub = da.isel(b=[0, 2])
        assert sub.shape == (2, 2)
        assert np.array_equal(sub.get_coord("b"), ["x", "z"])

    def test_fillna(self):
        da = DataArray(np.array([1.0, np.nan]), dims=("x",))
        assert np.array_equal(da.fillna(0).values, [1.0, 0.0])

    def test_concat_outer_join(self):
        a = DataArray(np.ones((2,)), coords={"n": np.array([3, 4])}, dims=("n",))
        b = DataArray(2 * np.ones((2,)), coords={"n": np.array([4, 5])}, dims=("n",))
        out = concat([a, b], "Step", labels=[0, 1], fill=np.nan)
        assert out.shape == (2, 3)
        assert np.array_equal(out.get_coord("n"), [3, 4, 5])
        assert np.isnan(out.values[0, 2]) and np.isnan(out.values[1, 0])
        filled = out.fillna(0)
        assert filled.values[1, 0] == 0


class TestNetcdf:
    def test_roundtrip_numeric(self, tmp_path):
        da = DataArray(
            np.random.rand(4, 6, 6),
            coords={
                "Step": np.arange(4, dtype=np.int64),
                "row": np.arange(1, 7),
                "col": np.arange(1, 7),
            },
            dims=("Step", "row", "col"),
            name="elastic",
        )
        path = tmp_path / "test.elastic"
        da.to_netcdf(path)
        back = open_dataset(path)
        assert "elastic" in back
        assert back["elastic"].allclose(da)
        assert np.array_equal(back["elastic"].get_coord("row"), np.arange(1, 7))

    def test_roundtrip_string_coords(self, tmp_path):
        da = DataArray(
            np.random.rand(2, 3),
            coords={
                "atom_triple": np.array(["N-Zn-N", "Zn-N-Zn"]),
                "cn": np.array([2, 3, 4]),
            },
            dims=("atom_triple", "cn"),
            name="bad",
        )
        path = tmp_path / "test.bad"
        da.to_netcdf(path)
        back = open_dataset(path)["bad"]
        assert np.array_equal(
            back.get_coord("atom_triple"), ["N-Zn-N", "Zn-N-Zn"]
        )
        assert back.allclose(da)

    def test_shared_dims_two_vars(self, tmp_path):
        ds = Dataset()
        ds["a"] = DataArray(np.ones((3,)), coords={"x": np.arange(3)}, dims=("x",))
        ds["b"] = DataArray(np.zeros((3,)), coords={"x": np.arange(3)}, dims=("x",))
        path = tmp_path / "two.nc"
        ds.to_netcdf(path)
        back = open_dataset(path)
        assert set(back.keys()) == {"a", "b"}

    def test_sel_missing_label_raises(self):
        da = DataArray(np.zeros(2), coords={"x": np.array([1, 2])}, dims=("x",))
        with pytest.raises(KeyError):
            da.sel(x=99)


class TestNetcdf4Read:
    """Reading netCDF-4 (HDF5) files — the format the reference's xarray
    writes when netcdf4 is installed (ADVICE r1)."""

    def _write_nc4(self, path, values, step_coord, str_coord):
        """Emulate the netCDF-4/HDF5 layout xarray+netCDF4 produce:
        dimension-scale datasets attached to variable dims."""
        import h5py

        with h5py.File(path, "w") as f:
            step = f.create_dataset("Step", data=step_coord)
            step.make_scale("Step")
            strs = f.create_dataset(
                "ring_var",
                data=np.array(str_coord, dtype=h5py.string_dtype()),
            )
            strs.make_scale("ring_var")
            var = f.create_dataset("rings", data=values)
            var.dims[0].attach_scale(step)
            var.dims[1].attach_scale(strs)

    def test_read_netcdf4_numeric_and_string_coords(self, tmp_path):
        import pytest

        pytest.importorskip("h5py")
        from amof_tpu.labeled import open_dataset

        path = str(tmp_path / "ref.ring")
        values = np.arange(8, dtype=np.float64).reshape(4, 2)
        self._write_nc4(path, values, np.arange(4) * 10, ["RC", "PN"])
        ds = open_dataset(path)
        da = ds["rings"]
        assert da.dims == ("Step", "ring_var")
        assert np.array_equal(da.get_coord("Step"), np.arange(4) * 10)
        assert list(da.get_coord("ring_var")) == ["RC", "PN"]
        np.testing.assert_array_equal(da.values, values)
        np.testing.assert_array_equal(
            da.sel(ring_var="PN").values, values[:, 1]
        )
